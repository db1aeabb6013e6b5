"""Kafka sink adapter: plug the wire-protocol producer into the
streaming job's producer-injection seam (``start_stream(sink_fn=...)``)
so a routed micro-batch is delivered to a LIVE broker from the
executors — the executed counterpart of the reference's
DB→engine→Kafka path (`src/e2e/cdc_test.zig:25-441`).

Scale shape (what K1 needs at 100 TB):

- **Executor-side produce, no driver funnel**: ``foreachPartition``
  gives every task its own ``WireProducer`` (one socket per task, the
  reference is one socket per process) — produce throughput scales
  with partition count, the driver only coordinates.
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
):
    """A ``sink_fn`` for ``streaming.job.start_stream``: produces each
    micro-batch's delivery frame (destination, key, value) to the
    broker. One producer per task; delivery confirmed per task before
    the batch can commit. ``bootstrap`` lists extra cluster endpoints
    beyond (host, port) so each task's producer can re-learn partition
    leadership through any live broker (multi-broker deployments)."""
    bootstrap = list(bootstrap or [])

    def sink(delivery: DataFrame, epoch_id: int) -> None:
        def produce_partition(rows) -> None:
            producer = WireProducer(
                host,
                port,
                acks=acks,
                retries=retries,
                retry_backoff_ms=retry_backoff_ms,
                bootstrap=bootstrap,
            )
            try:
                for row in rows:
                    key = row["key"]
                    value = row["value"]
                    producer.send(
                        row["destination"],
                        key.encode("utf-8") if key is not None else None,
                        value.encode("utf-8") if value is not None else None,
                        n_partitions=n_partitions,
                    )
                producer.flush()  # the task-local flush barrier (K3)
            finally:
                producer.close()

        delivery.select("destination", "key", "value").foreachPartition(
            produce_partition
        )

    return sink
