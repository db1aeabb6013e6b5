"""Deterministic text canonicalization: NFC + casefold + whitespace
collapse — the first stage of every text-dedup/tokenizer pipeline
(exact dedup over un-normalized text misses byte-different/
codepoint-equal duplicates; BPE vocabularies trained on mixed forms
split identical surface words).

Spark-first split of the work: Unicode NFC is the ONE step Spark has
no builtin for, so it runs as an Arrow-batched pandas_udf
(unicodedata.normalize — the sanctioned slow path, one Python node in
the plan); lowercasing and whitespace collapse stay JVM-side AFTER it
(lower + regexp_replace compose into the same whole-stage-codegen
span, and ordering them after the UDF keeps the Python exchange to
exactly one column pass). Output is fingerprinted (md5) so the
compare/shuffle payload is 16 bytes per doc, not the text.

Cross-engine contract: DuckDB's ``nfc_normalize``/``lower``/
``regexp_replace(..., 'g')``/``trim`` mirror each step exactly
(verified: composed and decomposed 'Café' forms agree byte-for-byte).
The corpus is ASCII, where NFC is the identity — so the driver query
PLANTS decomposed/uppercase/multi-space text on doc_id % 13 (the
emb_near_dup_lsh precedent) to make every stage earn its green row.

Scale (100 TB): embarrassingly parallel map over one column — no
shuffle at all; the Arrow batch transfer is the cost, paid once and
only for the NFC step Spark cannot express.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from outboxx_spark.sources.tables import read_table


def _nfc_batch(s: pd.Series) -> pd.Series:
    return s.map(lambda t: unicodedata.normalize("NFC", t) if isinstance(t, str) else None)


def normalize_expr(text: Column) -> Column:
    """NFC (Arrow UDF) -> lower -> collapse runs of whitespace -> trim,
    all but the first JVM-side. The UDF is wrapped lazily: pandas_udf
    registration needs an active SparkContext, and this module must
    import session-free (the driver imports __spark_entry__ before it
    builds the session)."""
    nfc = pandas_udf(_nfc_batch, "string")
    return F.trim(F.regexp_replace(F.lower(nfc(text)), r"\s+", " "))


def normalized_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", F.md5(normalize_expr(F.col(text_col))).alias("norm_md5"))


# plant: decomposed accent (combining acute U+0301), uppercase, and a
# double space — NFC, lower, and the collapse each change the result
_PLANT_SUFFIX = " CAFÉ  x"  # E + U+0301: decomposed on purpose


def planted_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(_PLANT_SUFFIX))
        ).otherwise(F.col("text")),
    )
    return normalized_fingerprints(planted)


PLANTED_NORMALIZE_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(nfc_normalize(
         CASE WHEN doc_id % 13 = 0 THEN text || ' CAFE' || chr(769) || '  x'
              ELSE text END)), '\\s+', ' ', 'g'))) AS norm_md5
FROM documents
"""
