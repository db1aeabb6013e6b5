"""Streaming cardinality ledger: per-source HLL registers maintained
as snapshot generations — live distinct counts that never recount
history.

Composes the per-group relational HyperLogLog (`dataops/hll.py`) with
the drift monitor's snapshot-generation protocol
(`streaming/drift_stream.py`): every micro-batch folds its registers
into the newest committed snapshot with groupBy(group, bucket).max
and publishes the merged state as generation <epoch>, marker-last.
Because register merge is an idempotent, commutative MAX, even a
replay that re-merged an already-folded batch would be a no-op on the
VALUES — the committed-gen guard merely spares the write. Crash
windows:

- replay of a committed epoch: returns immediately (marker exists);
- crash mid-write: a marker-less generation every reader skips; the
  replay rewrites it and commits;
- GC (retain 2) is prune-only over committed gens; a crash mid-prune
  leaves extra committed snapshots, never fewer.

Serving is `hll_estimate_by` over the newest snapshot — the estimator
is ONE JVM aggregation, so a dashboard polling per-source cardinality
reads G x 2^p register rows and never touches the event history. At
100 TB the state is still metadata-sized: 256 registers per source.

The same generations merge ACROSS streams (two pipelines' ledgers
union with the same groupBy-max), which is what makes the sketch, not
a counter table, the right streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from outboxx_spark.dataops.hll import P_BITS_BY, hll_estimate_by, hll_sketch_by
from outboxx_spark.fsutil import fs_read_text, fs_write_text, hadoop_fs

_GEN_COMMIT = "_GEN_COMMIT"
_REG_SCHEMA = "group string, bucket int, max_rho int"


def _committed_gens(spark: SparkSession, state_dir: str) -> list[int]:
    fs, root, _ = hadoop_fs(spark, state_dir)
    if not fs.exists(root):
        return []
    gens = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("gen="):
            g = int(name.split("=", 1)[1])
            if fs_read_text(spark, f"{state_dir}/gen={g}/{_GEN_COMMIT}") is not None:
                gens.append(g)
    return sorted(gens)


def gen_committed(spark: SparkSession, state_dir: str, epoch: int) -> bool:
    return fs_read_text(spark, f"{state_dir}/gen={epoch}/{_GEN_COMMIT}") is not None


def _read_gen(spark: SparkSession, state_dir: str, gen: int) -> DataFrame:
    return spark.read.schema(_REG_SCHEMA).parquet(
        f"{state_dir}/gen={gen}/registers"
    )


def apply_sketch_batch(
    batch: DataFrame,
    state_dir: str,
    epoch: int,
    group_col: str,
    key_col: str,
    p: int = P_BITS_BY,
) -> None:
    """The foreachBatch body: fold this batch's registers into the
    newest committed snapshot and publish generation ``epoch``."""
    spark = batch.sparkSession
    if gen_committed(spark, state_dir, epoch):
        return  # replayed epoch (and MAX would make re-merging benign)
    if batch.isEmpty():
        return
    regs = hll_sketch_by(batch, group_col, key_col, p)
    prev = _committed_gens(spark, state_dir)
    if prev:
        regs = (
            regs.unionByName(_read_gen(spark, state_dir, prev[-1]))
            .groupBy("group", "bucket")
            .agg(F.max("max_rho").alias("max_rho"))
        )
    gen_dir = f"{state_dir}/gen={epoch}"
    # G x 2^p rows: one file keeps every snapshot a metadata read
    regs.coalesce(1).write.mode("overwrite").parquet(f"{gen_dir}/registers")
    fs_write_text(spark, f"{gen_dir}/{_GEN_COMMIT}", "{}")
    fs, _, jvm = hadoop_fs(spark, state_dir)
    for g in _committed_gens(spark, state_dir)[:-2]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/gen={g}"), True)


def read_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    gens = _committed_gens(spark, state_dir)
    if not gens:
        raise FileNotFoundError(f"no committed sketch state under {state_dir}")
    return _read_gen(spark, state_dir, gens[-1])


def read_cardinalities(
    spark: SparkSession, state_dir: str, p: int = P_BITS_BY
) -> DataFrame:
    """(group, est): live per-source distinct counts from the newest
    snapshot — register rows in, one relational aggregation out."""
    return hll_estimate_by(read_registers(spark, state_dir), p)


def apply_theta_batch(
    batch: DataFrame,
    state_dir: str,
    epoch: int,
    group_col: str,
    key_col: str,
    k: int | None = None,
) -> None:
    """Theta-ledger sibling of :func:`apply_sketch_batch`: fold each
    batch's per-group KMV samples into the newest snapshot with
    union + re-trim (distinct hashes make even an unguarded re-merge
    value-safe, like the HLL MAX). The served state is the per-source
    sample frame `theta_sketch_by` would produce over the whole
    history — so the LIVE pairwise overlap matrix
    (`dataops/theta._pairwise_intersections`) comes straight off the
    snapshot: which sources are converging RIGHT NOW, no rescan."""
    from pyspark.sql import Window

    from outboxx_spark.dataops.theta import K_DEFAULT, theta_sketch_by

    k = K_DEFAULT if k is None else k
    spark = batch.sparkSession
    if gen_committed(spark, state_dir, epoch):
        return
    if batch.isEmpty():
        return
    regs = theta_sketch_by(batch, group_col, key_col, k)
    prev = _committed_gens(spark, state_dir)
    if prev:
        prev_df = spark.read.schema("group string, h long").parquet(
            f"{state_dir}/gen={prev[-1]}/registers"
        )
        w = Window.partitionBy("group").orderBy("h")
        regs = (
            regs.unionByName(prev_df)
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    gen_dir = f"{state_dir}/gen={epoch}"
    regs.coalesce(1).write.mode("overwrite").parquet(f"{gen_dir}/registers")
    fs_write_text(spark, f"{gen_dir}/{_GEN_COMMIT}", "{}")
    fs, _, jvm = hadoop_fs(spark, state_dir)
    for g in _committed_gens(spark, state_dir)[:-2]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/gen={g}"), True)


def read_theta_state(spark: SparkSession, state_dir: str) -> DataFrame:
    gens = _committed_gens(spark, state_dir)
    if not gens:
        raise FileNotFoundError(f"no committed sketch state under {state_dir}")
    return spark.read.schema("group string, h long").parquet(
        f"{state_dir}/gen={gens[-1]}/registers"
    )


def read_overlap_matrix(
    spark: SparkSession, state_dir: str, k: int | None = None
) -> dict[tuple[str, str], float]:
    """{(source_a, source_b): est_intersection} from the newest
    snapshot's G*k sample rows alone."""
    from outboxx_spark.dataops.theta import K_DEFAULT, _pairwise_intersections

    k = K_DEFAULT if k is None else k
    per: dict[str, list[int]] = {}
    for r in read_theta_state(spark, state_dir).collect():
        per.setdefault(r["group"], []).append(r["h"])
    for hs in per.values():
        hs.sort()
    return {
        pair: est for pair, (est, _) in _pairwise_intersections(per, k).items()
    }


def start_theta_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    key_col: str,
    *,
    k: int | None = None,
    available_now: bool = True,
):
    writer = stream_df.writeStream.foreachBatch(
        lambda b, e: apply_theta_batch(b, state_dir, e, group_col, key_col, k)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_sketch_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    key_col: str,
    *,
    p: int = P_BITS_BY,
    available_now: bool = True,
):
    writer = stream_df.writeStream.foreachBatch(
        lambda b, e: apply_sketch_batch(b, state_dir, e, group_col, key_col, p)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
