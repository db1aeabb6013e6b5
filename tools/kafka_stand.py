"""Kafka delivery stand: feed → engine → LIVE wire-protocol broker →
consume-back → gap check, executed in one process tree — the sink-side
companion of `tools/pg_stand.py` (which executes the source side
against a real PostgreSQL). Together they cover both real-dependency
layers the docker-compose stand (`deploy/load-stand/`) would exercise,
without a docker daemon.

What runs (all real, no stubs):
1. `tools/kafka_broker.py` broker on a TCP port (real Kafka protocol:
   Metadata/Produce/Fetch, message format v1, CRC verification).
2. The streaming CDC job (`streaming/job.py start_stream`) over the
   chosen testdata scale, delivering through
   `streaming/kafka_sink.py` — executor-side WireProducers, murmur2
   key partitioning, per-task flush barrier.
3. Consume-back of every destination topic from offset 0 and the
   reference-style gap check (`tests/load/scripts/check-gaps.sh`
   semantics): delivered LSN set per topic == routing-oracle LSN set;
   duplicates reported (at-least-once allows them), gaps fatal; and
   (r12) the per-key ORDER gate — first-delivery LSNs per (partition,
   key) must be monotone (replay duplicates are skipped: a lost-ACK
   replay legally re-appends older LSNs, that is the at-least-once
   contract, not disorder). Assumes the feed files arrive in LSN
   order (true for the driver-generated testdata), since the sink's
   order_by sorts within a micro-batch, not across batches.

Usage: python tools/kafka_stand.py [--sf /root/testdata/sf0.01]
Prints one JSON line with measured numbers; exit 1 on any gap, any
first-delivery order violation, or (--brokers N>1) a run where the
election never landed.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument(
        "--brokers", type=int, default=1,
        help="N>1: run against a KafkaCluster and rotate EVERY "
        "partition's leadership mid-stream (r11: the full pipeline "
        "must survive an election with zero gaps)",
    )
    args = ap.parse_args()

    from kafka_broker import KafkaBroker, KafkaCluster

    from outboxx_spark.pipeline import routed_envelopes
    from outboxx_spark.session import get_spark
    from outboxx_spark.streaming.job import start_stream
    from outboxx_spark.streaming.kafka_sink import make_kafka_sink
    from outboxx_spark.streaming.kafka_wire import consume_all
    from outboxx_spark.testbed import default_config

    spark = get_spark("kafka_stand")
    cfg = default_config()
    tmp = tempfile.mkdtemp(prefix="kafka_stand_")

    cluster = None
    leadership_moves = 0
    if args.brokers > 1:
        cluster = KafkaCluster(
            n_brokers=args.brokers, n_partitions=args.partitions
        )
        stand = cluster
    else:
        stand = KafkaBroker(n_partitions=args.partitions)

    with stand as stand:
        broker = cluster.brokers[0] if cluster else stand
        # Leg 0 — raw drain rate of ONE producer connection (the
        # reference's drain benchmark is single-process librdkafka;
        # this is the apples-to-apples number; the Spark sink runs one
        # such producer PER TASK, so fleet throughput multiplies)
        from outboxx_spark.streaming.kafka_wire import WireProducer

        n_raw = 100_000
        payload = json.dumps(
            {"op": "INSERT", "data": {"user_id": 7, "value": 1.25},
             "meta": {"source": "postgres", "resource": "public.t0",
                      "timestamp": 1755200000, "lsn": "0/1A2B"}}
        ).encode()
        raw = WireProducer(
            broker.host, broker.port,
            bootstrap=cluster.bootstrap() if cluster else [],
        )
        t_raw = time.monotonic()
        for i in range(n_raw):
            raw.send("raw.bench", str(i % 997).encode(), payload,
                     n_partitions=args.partitions)
        raw.flush()
        raw_sec = time.monotonic() - t_raw
        raw.close()

        rotator = None
        if cluster is not None:
            # mid-stream election: once deliveries are flowing, rotate
            # EVERY topic-partition's leadership one broker over; the
            # per-task producers must hit NOT_LEADER, refresh metadata
            # and reroute — zero gaps is the pass criterion below
            import threading

            def rotate_once():
                # wait until a DELIVERY topic (not the raw-drain one)
                # actually carries records, so the rotation lands
                # mid-delivery — a fixed sleep fired before the stream
                # created its topics and proved nothing. The shared
                # helper (kafka_broker.rotate_all_leaders) holds the
                # wait-then-rotate logic for this stand AND bench.py.
                nonlocal_moves[0], _t = cluster.rotate_all_leaders(
                    min_new_records=0,
                    exclude_topics={"raw.bench"},
                    deadline_s=300.0,
                    poll_s=0.3,
                )

            nonlocal_moves = [0]
            rotator = threading.Thread(target=rotate_once, daemon=True)
            rotator.start()

        t0 = time.monotonic()
        q = start_stream(
            spark,
            args.sf,
            cfg,
            f"{tmp}/out",
            f"{tmp}/ckpt",
            max_files_per_trigger=100,
            sink_fn=make_kafka_sink(
                broker.host, broker.port,
                bootstrap=cluster.bootstrap() if cluster else None,
                order_by="lsn",
            ),
        )
        q.awaitTermination(1800)
        produce_sec = time.monotonic() - t0
        if rotator is not None:
            rotator.join(timeout=1.0)
            leadership_moves = nonlocal_moves[0]

        expected = routed_envelopes(spark, args.sf, cfg)
        exp = expected.select("destination", "lsn").collect()
        want: dict[str, set] = defaultdict(set)
        for r in exp:
            want[r["destination"]].add(r["lsn"])

        t1 = time.monotonic()
        gaps = dups = consumed = order_violations = 0
        per_topic = {}
        for dest, want_lsns in sorted(want.items()):
            msgs = consume_all(broker.host, broker.port, dest)
            got = []
            # per-key ordering check (reference contract: a consumer
            # reads each key's changes in WAL order; the sink's
            # order_by="lsn" + producer in-flight=1 must deliver it).
            # Replay DUPLICATES are skipped before the monotonicity
            # test: a lost-ACK batch replay legally re-appends older
            # LSNs after newer ones — that is at-least-once, not
            # disorder; the gate judges FIRST deliveries only.
            per_key_last: dict[tuple, int] = {}
            # dedupe on (key, lsn), not bare lsn: if two different
            # keys ever carried the same LSN, a bare-LSN skip would
            # silently exclude the second key's FIRST delivery from
            # the monotonicity check (r12 advice finding)
            seen: set[tuple] = set()
            for m in sorted(msgs, key=lambda m: (m["partition"], m["offset"])):
                env = json.loads(m["value"])
                hi, lo = env["meta"]["lsn"].split("/")
                lsn = (int(hi, 16) << 32) | int(lo, 16)
                got.append(lsn)
                if (m["key"], lsn) in seen:
                    continue  # replay duplicate: counted via dups
                seen.add((m["key"], lsn))
                kk = (m["partition"], m["key"])
                if per_key_last.get(kk, -1) > lsn:
                    order_violations += 1
                per_key_last[kk] = lsn
            got_set = set(got)
            missing = len(want_lsns - got_set)
            gaps += missing
            dups += len(got) - len(got_set)
            consumed += len(msgs)
            per_topic[dest] = {
                "want": len(want_lsns),
                "got": len(got),
                "missing": missing,
                "dups": len(got) - len(got_set),
            }
        consume_sec = time.monotonic() - t1

    spark.stop()
    delivered = sum(t["want"] for t in per_topic.values())
    report = {
        "stand": "kafka_wire",
        "sf": args.sf,
        "brokers": args.brokers,
        "leadership_moves_mid_stream": leadership_moves,
        "broker_partitions": args.partitions,
        "raw_single_producer_events_per_sec": round(n_raw / raw_sec),
        "events_delivered": delivered,
        "events_consumed_back": consumed,
        "produce_pipeline_sec": round(produce_sec, 3),
        "events_per_sec": round(delivered / produce_sec) if produce_sec else None,
        "consume_back_sec": round(consume_sec, 3),
        "gaps": gaps,
        "duplicates": dups,
        "per_key_order_violations": order_violations,
        "topics": per_topic,
    }
    print(json.dumps(report))
    # an advertised election run where the rotation never landed
    # proves nothing — fail it rather than passing silently (r12
    # review: rotate_all_leaders returns (0, None) on deadline expiry)
    election_missing = args.brokers > 1 and leadership_moves == 0
    return 1 if gaps or order_violations or election_missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
