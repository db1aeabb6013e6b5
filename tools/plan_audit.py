"""Dump formatted physical plans for driver queries.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]

With no query names, audits every entry in __spark_entry__.queries().
Greppable output: each plan is delimited by '==== <name> ===='. Use it
after changing an operator to confirm the plan shape (broadcasts,
pushdown, codegen spans) is still the one SCALING.md claims.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:]

    from outboxx_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    for name in names or qs:
        print(f"==== {name} ====")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            print(buf.getvalue())
        except Exception as e:  # keep auditing the rest
            print(f"ERROR building plan: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
