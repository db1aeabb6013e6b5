"""Gap checker: prove no message loss across the pipeline, like the
reference's loss oracle (`tests/load/scripts/check-gaps.sh` compares
topic contents against the BIGSERIAL sequence).

Runs the streaming pipeline into a temp sink, then verifies that for
every stream the set of delivered LSNs equals the set of feed LSNs that
should route there — duplicates allowed (at-least-once), gaps fatal.

Usage: python tools/check_gaps.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from outboxx_spark.pipeline import routed_envelopes
    from outboxx_spark.session import get_spark
    from outboxx_spark.streaming.job import start_stream
    from outboxx_spark.testbed import default_config

    spark = get_spark("check_gaps")
    tmp = tempfile.mkdtemp(prefix="gapcheck_")
    cfg = default_config()
    q = start_stream(spark, sf_dir, cfg, f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination(300)

    delivered = spark.read.parquet(f"{tmp}/out")
    expected = routed_envelopes(spark, sf_dir, cfg)

    ok = True
    for row in expected.select("destination").distinct().collect():
        dest = row["destination"]
        want = {
            r["lsn"] for r in expected.filter(expected.destination == dest).select("lsn").collect()
        }
        got = {
            r["lsn"] for r in delivered.filter(delivered.destination == dest).select("lsn").collect()
        }
        missing = want - got
        extra = got - want
        dups = delivered.filter(delivered.destination == dest).count() - len(got)
        status = "OK" if not missing and not extra else "GAP"
        if missing or extra:
            ok = False
        print(
            f"{status} {dest}: {len(got)}/{len(want)} lsns, "
            f"missing={len(missing)} unexpected={len(extra)} duplicates={dups}"
        )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
