"""Kafka sink adapter: plug the wire-protocol producer into the
streaming job's producer-injection seam (``start_stream(sink_fn=...)``)
so a routed micro-batch is delivered to a LIVE broker from the
executors — the executed counterpart of the reference's
DB→engine→Kafka path (`src/e2e/cdc_test.zig:25-441`).

Scale shape (what K1 needs at 100 TB):

- **Executor-side produce, no driver funnel**: ``mapInPandas`` gives
  every task its own ``WireProducer`` (one socket set per task, the
  reference is one socket per process) — produce throughput scales
  with task count, the driver only coordinates. Rows reach Python as
  Arrow batches with UTF-8 encoding already done JVM-side.
- **Flush barrier inside the task** (K3): each task flushes and
  confirms delivery BEFORE it reports success; any DeliveryError fails
  the task → the micro-batch → the stream, all before the checkpoint
  commits the offsets (O2/K6 fail-fast). A replayed batch re-produces
  duplicates, never gaps — the reference's at-least-once contract.
- **Key-partitioned placement**: records are placed by
  murmur2(routing key) exactly like librdkafka/Java clients, so a
  consumer's per-key ordering matches what the reference's producer
  would deliver.

Against a production cluster the same delivery frame goes through
Spark's Kafka connector (`job.kafka_writer_options`, identical
producer configs); this module is the dependency-free path the sandbox
can actually EXECUTE, and the sink_fn seam makes them swappable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from outboxx_spark.streaming.kafka_wire import WireProducer


def make_kafka_sink(
    host: str,
    port: int,
    *,
    acks: int = -1,
    retries: int = 3,
    retry_backoff_ms: int = 500,
    n_partitions: int | None = None,
    bootstrap: list[tuple[str, int]] | None = None,
    sink_parallelism: int | None = None,
    tls_ca: str | None = None,
    sasl: tuple[str, str, str] | None = None,
    order_by: str | None = None,
):
    """A ``sink_fn`` for ``streaming.job.start_stream``: produces each
    micro-batch's delivery frame (destination, key, value) to the
    broker. One producer per task; delivery confirmed per task before
    the batch can commit. ``bootstrap`` lists extra cluster endpoints
    beyond (host, port) so each task's producer can re-learn partition
    leadership through any live broker (multi-broker deployments).

    ``sink_parallelism`` coalesces the frame before producing — the
    standard Kafka-sink tuning: produce parallelism beyond the topic's
    partition count adds broker-side contention, not throughput, so
    match it to the destination partition count (measured on the
    in-repo 3-broker stand: 32 tasks -> 22k ev/s, 8 tasks -> 81k ev/s
    for the same 55k-event frame). None leaves the upstream
    partitioning untouched.

    ``order_by`` names a monotone column in the delivery frame (the
    CDC pipeline's ``lsn``) and turns on the per-key ORDERING
    contract: the frame is hash-repartitioned on (destination, key)
    and sorted within partitions on (destination, key, order_by), so
    ALL of a key's records flow through ONE producer task in source
    order — combined with the producer's in-flight=1 discipline, a
    consumer reads each key's changes in WAL order, the reference's
    single-process guarantee reproduced on a distributed producer.
    Without it, a key's records can span tasks and interleave. Cost:
    one shuffle + in-partition sort per micro-batch — that is the
    honest price of total per-key order at scale; pipelines that only
    need at-least-once set-delivery skip it. Null keys hash to one
    partition — key-less streams should leave this off."""
    if sink_parallelism is not None and sink_parallelism <= 0:
        raise ValueError("sink_parallelism must be a positive task count")
    bootstrap = list(bootstrap or [])

    def sink(delivery: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        def produce_batches(pdf_iter):
            import pandas as pd

            producer = WireProducer(
                host,
                port,
                acks=acks,
                retries=retries,
                retry_backoff_ms=retry_backoff_ms,
                bootstrap=bootstrap,
                tls_ca=tls_ca,
                sasl=sasl,
            )
            try:
                send = producer.send
                for pdf in pdf_iter:
                    for dest, key, value in zip(
                        pdf["destination"].values,
                        pdf["key"].values,
                        pdf["value"].values,
                    ):
                        send(
                            dest,
                            key if key is not None else None,
                            value if value is not None else None,
                            n_partitions=n_partitions,
                        )
                producer.flush()  # the task-local flush barrier (K3)
            finally:
                producer.close()
            yield pd.DataFrame({"acked": [producer.sent]})

        # Arrow-batched transfer (mapInPandas) instead of pickled Rows
        # (foreachPartition): the executor->Python hop is the dominant
        # per-record cost at bench scale, and Arrow moves it ~an order
        # of magnitude. UTF-8 encoding happens JVM-side (F.encode) so
        # the Python loop touches ready-to-wire bytes only. The
        # one-row-per-task result both forces execution and carries the
        # per-task delivery count through the same flush barrier.
        cols = [
            F.col("destination"),
            F.encode(F.col("key"), "UTF-8").alias("key"),
            F.encode(F.col("value"), "UTF-8").alias("value"),
        ]
        if order_by is not None:
            frame = delivery.select(*cols, F.col(order_by).alias("_ord"))
            # defaultParallelism, NOT the upstream partition count: a
            # file-trigger batch can carry max_files_per_trigger
            # splits, the over-parallelism regime the sink_parallelism
            # docstring measures as throughput-destroying; and reading
            # rdd.getNumPartitions() would pay a plan conversion per
            # micro-batch just to learn a number (r12 review)
            npart = (
                sink_parallelism
                or delivery.sparkSession.sparkContext.defaultParallelism
            )
            frame = (
                frame.repartition(npart, "destination", "key")
                .sortWithinPartitions("destination", "key", "_ord")
                .drop("_ord")
            )
        else:
            frame = delivery.select(*cols)
            if sink_parallelism is not None:
                frame = frame.coalesce(sink_parallelism)
        frame.mapInPandas(
            produce_batches, schema="acked long"
        ).collect()

    return sink
