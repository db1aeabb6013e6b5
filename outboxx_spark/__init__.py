"""outboxx_spark — a PySpark-native change-data-capture & data-pipeline engine.

A from-scratch rebuild of the capabilities of the reference CDC pipeline
(lukashes/outboxx, a single-process Zig binary that streams Postgres WAL
changes to Kafka): typed change events, consistent snapshot + stream,
per-table routing with fan-out, partition keying, JSON envelope
serialization, at-least-once delivery, and observability — re-expressed as
Spark DataFrame / Structured Streaming programs, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design is Spark-first: declarative plans for Catalyst, broadcast joins for
config-sized dimensions, map-side combines for tallies, partition-parallel
fan-out, Arrow-batched Pandas UDFs only where built-ins cannot express the
semantics.
"""

__version__ = "0.1.0"
