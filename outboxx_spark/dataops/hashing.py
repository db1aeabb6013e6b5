"""Deterministic, cross-engine-stable hashing primitives.

Every hash here is derived from md5 so the DuckDB oracle can reproduce it
exactly (Spark's builtin xxhash64/hash are engine-specific). The 60-bit
value fits a signed int64 with headroom so modular arithmetic below never
overflows under ANSI mode.

MinHash parameters: the classic (a*h + b) mod P family with P prime just
above 2^32; h is first reduced mod P so every product stays < 2^62.
Constants are generated from a fixed seed and embedded in BOTH the Spark
expressions and the oracle SQL.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# prime > 2^32
HASH_P = 4_294_967_311
# a,b < 2^30 so a * (h mod P) + b < 2^62 — no int64 overflow (ANSI-safe)
_A_MAX = 1 << 30

N_MINHASHES = 128
LSH_BAND_SIZE = 4  # 32 bands of 4 -> P(miss at j=0.8) = (1-0.8^4)^32 ~ 5e-8

_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, _A_MAX) for _ in range(N_MINHASHES)]
MINHASH_B = [_rng.randrange(0, _A_MAX) for _ in range(N_MINHASHES)]

SIMHASH_BITS = 60  # keep below 63 so 1<<bit stays positive in int64


def md5_hash60(col: Column) -> Column:
    """String -> stable 60-bit non-negative int64 (first 15 hex chars of
    md5). Oracle equivalent: ``md5_hash60_sql``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


