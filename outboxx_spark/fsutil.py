"""Scheme-aware filesystem access via Spark's Hadoop configuration.

Driver-local ``os.path`` probes silently misreport on any non-local
data location (hdfs://, s3a://, file:// URIs): ``isdir``/``exists``
return False, and callers skip merges or snapshot sources without an
error. Every existence/listing probe against a DATA path must go
through Hadoop's FileSystem API instead (local paths resolve through
RawLocalFileSystem, so behavior is unchanged where os.path worked).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path, jvm) for ``path_str``, resolved through the
    session's Hadoop conf — scheme-aware, unlike driver-local os.path."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def fs_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path, _ = hadoop_fs(spark, path_str)
    return bool(fs.exists(path))


def fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    """Write a small text file through Hadoop's FileSystem (works on any
    scheme Spark can reach). For metadata-sized payloads only — the
    bytes pass through the py4j gateway.

    Write-temp-then-rename (same atomicity discipline as the table
    sink's commit): a crash mid-write must never leave a truncated
    file at the final path — readers distinguish only absent (retry/
    initialize) from complete. The final path must not already exist
    when called (metadata files here are write-once). The temp name is
    per-writer-unique: a shared ``.tmp`` would let a concurrent first
    writer truncate this writer's in-flight bytes and then have THIS
    writer publish the mangled file as a success."""
    import uuid

    fs, path, jvm = hadoop_fs(spark, path_str)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path_str}.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, path):
        # Two concurrent first-writers can race here (and S3A's
        # copy+delete rename is not atomic — its commit point is the
        # copy completing; a crash after copy leaves an inert, uniquely
        # named .tmp, never a truncated destination): if the
        # destination now holds exactly the payload we meant to write,
        # the other writer won and this call's contract is satisfied —
        # only a CONFLICTING destination is an error.
        fs.delete(tmp, False)
        current = fs_read_text(spark, path_str)
        if current == text:
            return
        if current is None:
            # transient store failure, not a lost race — nobody's
            # payload is at the destination
            raise IOError(
                f"rename failed: {tmp} -> {path} (destination absent after failed rename)"
            )
        raise IOError(f"rename failed: {tmp} -> {path} (destination differs)")


def fs_read_text(spark: SparkSession, path_str: str) -> str | None:
    """Read a small text file through Hadoop's FileSystem; None if the
    file does not exist."""
    fs, path, _ = hadoop_fs(spark, path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()
