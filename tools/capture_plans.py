"""Capture .explain('formatted') output for named declared queries.

Usage:
    python tools/capture_plans.py <repo_root> <out_dir> <suffix> <query> [query ...]

For each query name, builds the DataFrame via __spark_entry__.queries()
(at $SPARK_GRAFT_SF_DIR, default sf0.1) and writes the formatted plan to
<out_dir>/<query>_<suffix>.txt. The special name ``cdc_pipeline_full``
captures the routed_envelopes pipeline plan (the bench headline leg).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path


def main() -> None:
    repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    from outboxx_spark.session import get_spark

    spark = get_spark("plan_capture")
    import __spark_entry__ as E

    qs = dict(E.queries())

    def build(name):
        if name == "cdc_pipeline_full":
            from outboxx_spark.pipeline import routed_envelopes
            from outboxx_spark.testbed import default_config

            return routed_envelopes(spark, sf_dir, default_config())
        return qs[name](spark, sf_dir)

    for name in names:
        try:
            df = build(name)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}_{suffix}.txt").write_text(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
