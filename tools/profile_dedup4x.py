"""One-off profiler for the dedup 4x scaling regression (round 8).

Breaks minhash_dedup_pairs into its stages at 1x and 4x the sf0.1
documents corpus and times each, so the 4x ratio can be attributed to a
stage instead of guessed at. Also times an r6-style buckets kernel
(prefilter + bands UDF + posexplode, no fused sh column) against the
current fused path for the same corpus.
"""
from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as SF

from outboxx_spark.dataops import dedup as dd
from outboxx_spark.session import get_spark
from outboxx_spark.sources.tables import read_table


def timed(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


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


def profile(spark, df, tag):
    out = {}
    t0 = time.perf_counter()
    sets_ = dd._materialize_corpus(
        dd._parallelized(df).select("doc_id", dd.shingles(SF.col("text"), 3).alias("sh"))
    )
    out["sets_materialize"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    buckets = dd.lsh_band_buckets_from_sets(sets_).localCheckpoint(eager=True)
    out["buckets_checkpoint"] = round(time.perf_counter() - t0, 3)

    out["pairs_verify"] = timed(
        lambda: dd.verify_jaccard_pairs(
            dd.lsh_bucket_pairs(buckets), sets_, sets_, 0.5
        ).write.format("noop").mode("overwrite").save()
    )

    # r6-style kernel: prefilter nonempty, bands UDF without the fused
    # sh column, posexplode
    def r6_buckets():
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

    out["buckets_r6_style"] = timed(
        lambda: r6_buckets().localCheckpoint(eager=True), n=2
    )
    out["buckets_r7_fused"] = timed(
        lambda: dd.lsh_band_buckets_from_sets(sets_).localCheckpoint(eager=True), n=2
    )
    print(tag, out, flush=True)
    return out


def main():
    spark = get_spark("profile-dedup4x")
    sf_dir = "/root/testdata/sf0.1"
    small = corpus(spark, sf_dir, 1)
    big = corpus(spark, sf_dir, 4)
    # warm
    dd.minhash_dedup_pairs(small).write.format("noop").mode("overwrite").save()
    t1 = timed(lambda: dd.minhash_dedup_pairs(small).write.format("noop").mode("overwrite").save())
    t4 = timed(lambda: dd.minhash_dedup_pairs(big).write.format("noop").mode("overwrite").save())
    print("end_to_end", {"1x": t1, "4x": t4, "ratio": round(t4 / t1, 2)}, flush=True)
    p1 = profile(spark, small, "stage_1x")
    p4 = profile(spark, big, "stage_4x")
    for k in p1:
        print(f"ratio {k}: {round(p4[k] / max(p1[k], 1e-9), 2)}", flush=True)


if __name__ == "__main__":
    main()
