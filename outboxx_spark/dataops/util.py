"""Shared dataops helpers."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


@contextmanager
def conf_override(spark: SparkSession, key: str, value: str):
    """Temporarily set a runtime SQL conf, restoring the previous value
    (or unsetting) on exit. Session-global: callers must not assume
    isolation from concurrently running queries — use it around a
    bounded window of jobs that all want the override (e.g. the
    incremental-dedup query disables AQE for its batch-sized,
    explicitly-planned ingest jobs, where per-shuffle stage
    materialization costs more than runtime re-planning saves)."""
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def parallelized(df: DataFrame) -> DataFrame:
    """Small corpora arrive as one file -> one partition, serializing
    explode-/compute-heavy operators on a single core. Spread them
    (measured 4.5x on ngram pairs at sf0.1, local[32]).

    The partition probe uses ``inputFiles()`` (a driver-side listing),
    NOT ``df.rdd.getNumPartitions()`` — converting to RDD compiles the
    plan and costs ~1s per call. Non-file-backed frames (already
    shuffled/derived) skip the repartition.

    Few files does NOT mean few partitions (r6 fix): the parquet scan
    splits large files at ``spark.sql.files.maxPartitionBytes``, so a
    single multi-GB file already yields >= target scan partitions — and
    repartitioning THAT would be a full corpus-scale shuffle for
    nothing. Repartition only when the files are few AND small enough
    that the scan genuinely cannot produce ``target`` splits."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not (0 < len(files) < target):
        return df
    try:
        from outboxx_spark.fsutil import hadoop_fs

        total_bytes = 0
        for f in files:
            fs, p, _ = hadoop_fs(spark, f)
            total_bytes += fs.getFileStatus(p).getLen()
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        digits = "".join(ch for ch in raw if ch.isdigit())
        max_split = int(digits) if digits else 134217728
        if raw.rstrip("bB").endswith(("k", "K")):
            max_split *= 1024
        elif raw.rstrip("bB").endswith(("m", "M")):
            max_split *= 1024 * 1024
        elif raw.rstrip("bB").endswith(("g", "G")):
            max_split *= 1024 * 1024 * 1024
    except Exception:
        # size probe failed: fall back to the file-count heuristic
        return df.repartition(target)
    if total_bytes >= target * max_split:
        return df  # the scan already splits into >= target partitions
    return df.repartition(target)
