"""Round-8 follow-up profiler: plan diff + repeat-decay for the buckets
stage at 4x. Run with PYTHONPATH=/root/repo."""
from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as SF

from outboxx_spark.dataops import dedup as dd
from outboxx_spark.session import get_spark
from outboxx_spark.sources.tables import read_table


def corpus(spark, sf_dir, mult):
    docs = read_table(spark, sf_dir, "documents")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    n_docs = docs.count()
    copies = [docs.select("doc_id", "text")]
    for r in range(1, mult):
        rot = alpha[r:] + alpha[:r]
        copies.append(
            docs.select(
                (SF.col("doc_id") + r * n_docs).alias("doc_id"),
                SF.translate("text", alpha, rot).alias("text"),
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return big.repartition(32).localCheckpoint(eager=True)


def r6_buckets(sets_):
    n_bands = dd.N_MINHASHES // dd.LSH_BAND_SIZE

    @SF.pandas_udf("array<string>")
    def _bands(h_arrs: pd.Series) -> pd.Series:
        mins = dd._perm_min_matrix(h_arrs)
        if not len(mins):
            return pd.Series([], dtype=object)
        digits = mins.astype("U10")
        return pd.Series(
            [
                [
                    "_".join(row[b * dd.LSH_BAND_SIZE : (b + 1) * dd.LSH_BAND_SIZE])
                    for b in range(n_bands)
                ]
                for row in digits
            ]
        )

    return dd._nonempty_hashes(sets_, "sh").select(
        "doc_id", SF.posexplode(_bands(SF.col("ha"))).alias("band", "sig")
    )


def main():
    spark = get_spark("profile-dedup4x-b")
    sf_dir = "/root/testdata/sf0.1"
    big = corpus(spark, sf_dir, 4)
    print("n_docs_4x", big.count(), flush=True)
    sets_ = dd._materialize_corpus(
        dd._parallelized(big).select("doc_id", dd.shingles(SF.col("text"), 3).alias("sh"))
    )
    fused = dd.lsh_band_buckets_from_sets(sets_)
    print("=== FUSED PLAN ===")
    fused.explain("formatted")
    print("=== R6-STYLE PLAN ===")
    r6_buckets(sets_).explain("formatted")

    for tag, builder in (("fused", lambda: dd.lsh_band_buckets_from_sets(sets_)),
                         ("r6sty", lambda: r6_buckets(sets_))):
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            cp = builder().localCheckpoint(eager=True)
            times.append(round(time.perf_counter() - t0, 3))
            cp.unpersist()
        print(tag, "decay", times, flush=True)


if __name__ == "__main__":
    main()
