"""Kafka wire-protocol client: a dependency-free producer/consumer
speaking the real Apache Kafka TCP protocol (message format v1), so the
K1 sink layer can be EXECUTED against a live broker in-sandbox — the
same role `sources/pg_replication.py` plays for the Postgres wire
(S2): no container, no native library, real bytes on a real socket.

Reference parity (`src/sink/kafka/producer.zig`):

- **send + flush barrier** (`producer.zig:286-378`): ``send`` buffers;
  ``flush`` produces every buffered batch and returns only when the
  broker acked ALL of them — and a drained queue is not a delivered
  queue, so flush re-raises if any batch ultimately failed (K3).
- **bounded retries with backoff** (`producer.zig:111-176` configs:
  retries=3, retry.backoff.ms=500): retriable broker errors are
  retried up to ``retries`` times; exhaustion increments
  ``delivery_errors`` and raises (K6 fail-fast — the supervisor
  restarts and the checkpoint replays, at-least-once).
- **acks=all** (-1) is the default, like ``enable.idempotence`` forces
  in the reference.
- **default partitioner** = murmur2(key) & 0x7fffffff mod n — the same
  function librdkafka and the Java client use, so partition placement
  matches what the reference's producer would do for the same key.

Protocol subset (public Apache Kafka protocol spec; old, stable
versions chosen so the encoding is small and CRC-checkable):

- ApiVersions v0 (key 18), Metadata v0 (key 3), Produce v2 (key 0),
  Fetch v2 (key 1).
- Record format: MessageSet with message magic v1
  (crc32 | magic | attributes | timestamp | key | value), CRC over
  everything after the crc field — the broker verifies it, so a
  corrupted frame is detected like the reference's delivery-report
  error path.

The client is deliberately executor-friendly: `WireProducer` holds one
socket set, no threads, no global state — the sink's `mapInPandas`
opens one per task (see `streaming/kafka_sink.py`).
"""

from __future__ import annotations

import io
import socket
import struct
import time
import zlib
from dataclasses import dataclass, field

API_PRODUCE = 0
API_FETCH = 1
API_METADATA = 3
API_SASL_HANDSHAKE = 17
API_VERSIONS = 18
API_SASL_AUTHENTICATE = 36

# Kafka error codes (public protocol spec) used here
ERR_NONE = 0
ERR_CORRUPT_MESSAGE = 2
ERR_UNKNOWN_TOPIC = 3
ERR_REQUEST_TIMED_OUT = 7
ERR_NOT_LEADER = 6
ERR_ILLEGAL_SASL_STATE = 34
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_SASL_AUTHENTICATION_FAILED = 58

RETRIABLE_ERRORS = {ERR_REQUEST_TIMED_OUT, ERR_NOT_LEADER, ERR_CORRUPT_MESSAGE}

# key->partition memo bound (see WireProducer._part_cache)
_PART_CACHE_MAX = 1 << 17


class KafkaWireError(RuntimeError):
    pass


class DeliveryError(KafkaWireError):
    """A batch exhausted its retries — the fail-fast signal (K6)."""


# ---------------------------------------------------------------------------
# primitive encode/decode
# ---------------------------------------------------------------------------


def _enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Reader:
    def __init__(self, data: bytes):
        self._b = io.BytesIO(data)

    def _take(self, n: int) -> bytes:
        out = self._b.read(n)
        if len(out) != n:
            raise KafkaWireError("truncated response")
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self._take(n)

    def remaining(self) -> int:
        pos = self._b.tell()
        self._b.seek(0, io.SEEK_END)
        end = self._b.tell()
        self._b.seek(pos)
        return end - pos


# ---------------------------------------------------------------------------
# message format v1 (magic 1): the unit the broker CRC-verifies
# ---------------------------------------------------------------------------


def encode_message(key: bytes | None, value: bytes | None, timestamp_ms: int) -> bytes:
    body = (
        struct.pack(">bb", 1, 0)  # magic=1, attributes=0 (no compression)
        + struct.pack(">q", timestamp_ms)
        + _enc_bytes(key)
        + _enc_bytes(value)
    )
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", crc) + body


def encode_message_set(
    messages: list[tuple[bytes | None, bytes | None, int]]
) -> bytes:
    """[(key, value, timestamp_ms)] -> MessageSet bytes. Producer-side
    offsets are placeholders (the broker assigns real ones)."""
    out = bytearray()
    for i, (k, v, ts) in enumerate(messages):
        msg = encode_message(k, v, ts)
        out += struct.pack(">qi", i, len(msg)) + msg
    return bytes(out)


def decode_message_set(data: bytes) -> list[dict]:
    """MessageSet bytes -> [{offset, timestamp_ms, key, value}], CRC
    verified per message. A trailing partial message (the broker may
    cut at max_bytes) is ignored, per protocol."""
    out: list[dict] = []
    pos = 0
    while pos + 12 <= len(data):
        offset, size = struct.unpack_from(">qi", data, pos)
        if pos + 12 + size > len(data):
            break  # partial trailing message
        msg = data[pos + 12 : pos + 12 + size]
        r = _Reader(msg)
        crc = r.u32()
        body = msg[4:]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise KafkaWireError(f"CRC mismatch at offset {offset}")
        magic = r.i8()
        r.i8()  # attributes
        ts = r.i64() if magic >= 1 else -1
        key = r.bytes_()
        value = r.bytes_()
        out.append({"offset": offset, "timestamp_ms": ts, "key": key, "value": value})
        pos += 12 + size
    return out


def murmur2(data: bytes) -> int:
    """Kafka's default-partitioner hash (public Java client
    Utils.murmur2), so key->partition placement matches real clients."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little", signed=False)
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rest = length - i
    if rest == 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if rest >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if rest >= 1:
        h ^= data[i] & 0xFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for(key: bytes, n_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


# ---------------------------------------------------------------------------
# SASL/SCRAM primitives (RFC 5802 + RFC 7677), shared with the broker
# stand — all stdlib (hashlib.pbkdf2_hmac / hmac), so the handshake the
# reference delegates to librdkafka is EXECUTED here, not mocked.
# ---------------------------------------------------------------------------

SCRAM_HASHES = {"SCRAM-SHA-256": "sha256", "SCRAM-SHA-512": "sha512"}
SCRAM_ITERATIONS = 4096  # RFC 7677 minimum announced by the stand


def scram_escape(name: str) -> str:
    """saslname encoding: '=' and ',' are reserved (RFC 5802 §5.1)."""
    return name.replace("=", "=3D").replace(",", "=2C")


def scram_salted_password(
    mechanism: str, password: str, salt: bytes, iterations: int
) -> bytes:
    import hashlib

    return hashlib.pbkdf2_hmac(
        SCRAM_HASHES[mechanism], password.encode("utf-8"), salt, iterations
    )


def scram_keys(mechanism: str, salted: bytes) -> tuple[bytes, bytes, bytes]:
    """-> (client_key, stored_key, server_key) per RFC 5802 §3."""
    import hashlib
    import hmac as hmac_mod

    digest = SCRAM_HASHES[mechanism]
    client_key = hmac_mod.new(salted, b"Client Key", digest).digest()
    stored_key = hashlib.new(digest, client_key).digest()
    server_key = hmac_mod.new(salted, b"Server Key", digest).digest()
    return client_key, stored_key, server_key


def scram_hmac(mechanism: str, key: bytes, msg: bytes) -> bytes:
    import hmac as hmac_mod

    return hmac_mod.new(key, msg, SCRAM_HASHES[mechanism]).digest()


def encode_produce_payload(
    batches: list[tuple[str, int, bytes]], acks: int, timeout_ms: int
) -> bytes:
    """Produce v2 request body for ``(topic, partition, message_set)``
    batches — the protocol's native multi-partition form."""
    by_topic: dict[str, list[tuple[int, bytes]]] = {}
    for t, p, ms in batches:
        by_topic.setdefault(t, []).append((p, ms))
    payload = struct.pack(">hi", acks, timeout_ms) + struct.pack(
        ">i", len(by_topic)
    )
    for t, parts in by_topic.items():
        payload += _enc_str(t) + struct.pack(">i", len(parts))
        for p, ms in parts:
            payload += struct.pack(">i", p) + _enc_bytes(ms)
    return payload


def parse_produce_response(r: _Reader) -> dict[tuple[str, int], dict]:
    out: dict[tuple[str, int], dict] = {}
    for _ in range(r.i32()):
        t = r.string() or ""
        for _ in range(r.i32()):
            pid, err, base = r.i32(), r.i16(), r.i64()
            r.i64()  # log_append_time
            out[(t, pid)] = {"error": err, "base_offset": base}
    r.i32()  # throttle_time_ms
    return out


# ---------------------------------------------------------------------------
# connection: framed request/response with correlation ids
# ---------------------------------------------------------------------------


class KafkaConnection:
    def __init__(self, host: str, port: int, client_id: str = "outboxx_spark",
                 timeout_s: float = 15.0, ssl_context=None,
                 sasl: tuple[str, str, str] | None = None):
        # request.timeout.ms=15000 mirrored from the reference producer
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        if ssl_context is not None:
            # broker cert verified against the configured CA bundle,
            # hostname/IP-SAN checked — the ssl.ca.location contract
            # the reference hands librdkafka (config.zig:37-94)
            self._sock = ssl_context.wrap_socket(
                self._sock, server_hostname=host
            )
        self._client_id = client_id
        self._corr = 0
        if sasl is not None:
            # authenticate BEFORE any other API — the broker refuses
            # everything but ApiVersions/SaslHandshake/SaslAuthenticate
            # on an unauthenticated connection (SASL_* protocols);
            # TLS wrap (if any) already happened above, so SASL_SSL is
            # handshake-inside-TLS exactly like the Java client
            self._sasl_authenticate(*sasl)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise KafkaWireError("broker closed connection")
            buf += chunk
        return bytes(buf)

    def send_request(self, api_key: int, api_version: int, payload: bytes) -> int:
        """Write one framed request WITHOUT reading the response —
        the pipelining half (Kafka processes a connection's requests
        in order, so responses arrive in correlation order). Pair with
        ``read_response``."""
        self._corr += 1
        header = (
            struct.pack(">hhi", api_key, api_version, self._corr)
            + _enc_str(self._client_id)
        )
        frame = header + payload
        self._sock.sendall(struct.pack(">i", len(frame)) + frame)
        return self._corr

    def read_response(self, corr: int) -> _Reader:
        (size,) = struct.unpack(">i", self._recv_exact(4))
        resp = self._recv_exact(size)
        r = _Reader(resp)
        got = r.i32()
        if got != corr:
            raise KafkaWireError(f"correlation mismatch {got} != {corr}")
        return r

    def request(self, api_key: int, api_version: int, payload: bytes) -> _Reader:
        return self.read_response(self.send_request(api_key, api_version, payload))

    # -- SASL (handshake v1 + authenticate v0: header-wrapped tokens) --

    def _sasl_send(self, token: bytes) -> bytes:
        r = self.request(API_SASL_AUTHENTICATE, 0, _enc_bytes(token))
        err = r.i16()
        msg = r.string()
        out = r.bytes_() or b""
        if err != ERR_NONE:
            raise KafkaWireError(f"SASL authentication failed ({err}): {msg}")
        return out

    def _sasl_authenticate(self, mechanism: str, username: str, password: str) -> None:
        """SaslHandshake v1 then the mechanism's token exchange.
        PLAIN is one NUL-joined token (RFC 4616); SCRAM-SHA-256/512 is
        the full RFC 5802 three-message exchange INCLUDING server-
        signature verification — the client proves the password, the
        broker proves it holds the server key (mutual), exactly what
        librdkafka does for the reference's `sasl.mechanism` configs."""
        r = self.request(API_SASL_HANDSHAKE, 1, _enc_str(mechanism))
        err = r.i16()
        mechs = [r.string() for _ in range(r.i32())]
        if err != ERR_NONE:
            raise KafkaWireError(
                f"SASL handshake refused ({err}); broker offers {mechs}"
            )
        if mechanism == "PLAIN":
            self._sasl_send(
                b"\x00" + username.encode("utf-8")
                + b"\x00" + password.encode("utf-8")
            )
            return
        if mechanism not in SCRAM_HASHES:
            raise KafkaWireError(f"unsupported SASL mechanism {mechanism}")
        import base64
        import secrets

        cnonce = secrets.token_urlsafe(18)
        gs2 = "n,,"
        client_first_bare = f"n={scram_escape(username)},r={cnonce}"
        server_first = self._sasl_send(
            (gs2 + client_first_bare).encode("utf-8")
        ).decode("utf-8")
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        snonce, salt = attrs["r"], base64.b64decode(attrs["s"])
        iterations = int(attrs["i"])
        if not snonce.startswith(cnonce):
            raise KafkaWireError("SCRAM server nonce does not extend ours")
        channel_binding = base64.b64encode(gs2.encode("utf-8")).decode()
        client_final_wo = f"c={channel_binding},r={snonce}"
        auth_msg = ",".join(
            [client_first_bare, server_first, client_final_wo]
        ).encode("utf-8")
        salted = scram_salted_password(mechanism, password, salt, iterations)
        client_key, stored_key, server_key = scram_keys(mechanism, salted)
        client_sig = scram_hmac(mechanism, stored_key, auth_msg)
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_final = self._sasl_send(
            f"{client_final_wo},p={base64.b64encode(proof).decode()}".encode()
        ).decode("utf-8")
        fattrs = dict(kv.split("=", 1) for kv in server_final.split(","))
        expect = scram_hmac(mechanism, server_key, auth_msg)
        if base64.b64decode(fattrs.get("v", "")) != expect:
            raise KafkaWireError(
                "SCRAM server signature mismatch (broker failed mutual auth)"
            )

    # -- Metadata v0 --

    def metadata(self, topics: list[str]) -> dict:
        payload = struct.pack(">i", len(topics)) + b"".join(
            _enc_str(t) for t in topics
        )
        r = self.request(API_METADATA, 0, payload)
        brokers = {}
        for _ in range(r.i32()):
            node, host, port = r.i32(), r.string(), r.i32()
            brokers[node] = (host, port)
        out: dict = {"brokers": brokers, "topics": {}}
        for _ in range(r.i32()):
            terr, tname = r.i16(), r.string()
            parts = {}
            for _ in range(r.i32()):
                perr, pid, leader = r.i16(), r.i32(), r.i32()
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                parts[pid] = {"error": perr, "leader": leader}
            out["topics"][tname] = {"error": terr, "partitions": parts}
        return out

    # -- Produce v2 (acks, timeout; one or many topic-partition batches) --

    def produce_multi(
        self,
        batches: list[tuple[str, int, bytes]],
        *,
        acks: int = -1,
        timeout_ms: int = 30000,
    ) -> dict[tuple[str, int], dict]:
        """One Produce request carrying every ``(topic, partition,
        message_set)`` batch — the protocol's native multi-partition
        form, so a flush costs one round trip per BROKER rather than
        one per partition. -> {(topic, partition): {error, base_offset}}
        with per-partition error codes (a mixed response is normal
        after a leadership move)."""
        r = self.request(
            API_PRODUCE, 2, encode_produce_payload(batches, acks, timeout_ms)
        )
        return parse_produce_response(r)

    def produce(
        self,
        topic: str,
        partition: int,
        message_set: bytes,
        *,
        acks: int = -1,
        timeout_ms: int = 30000,
    ) -> dict:
        res = self.produce_multi(
            [(topic, partition, message_set)], acks=acks, timeout_ms=timeout_ms
        )
        val = res.get((topic, partition))
        if val is None:
            # a response that does not echo the requested partition is
            # an anomaly; classify as retriable rather than crashing
            # the caller's error handling with a KeyError
            val = {"error": ERR_REQUEST_TIMED_OUT, "base_offset": -1}
        return {"partition": partition, **val}

    # -- Fetch v2 --

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        *,
        max_bytes: int = 1 << 20,
        max_wait_ms: int = 100,
    ) -> tuple[int, list[dict]]:
        """-> (high_watermark, messages from ``offset``)."""
        payload = (
            struct.pack(">iii", -1, max_wait_ms, 1)  # replica, wait, min_bytes
            + struct.pack(">i", 1)
            + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        r = self.request(API_FETCH, 2, payload)
        r.i32()  # throttle_time_ms
        hw, msgs = -1, []
        for _ in range(r.i32()):
            r.string()  # topic
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                hw = r.i64()
                data = r.bytes_() or b""
                if err != ERR_NONE:
                    raise KafkaWireError(f"fetch error {err}")
                msgs = decode_message_set(data)
        return hw, msgs

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self.request(API_VERSIONS, 0, b"")
        err = r.i16()
        if err != ERR_NONE:
            raise KafkaWireError(f"api_versions error {err}")
        out = {}
        for _ in range(r.i32()):
            k, lo, hi = r.i16(), r.i16(), r.i16()
            out[k] = (lo, hi)
        return out


# ---------------------------------------------------------------------------
# producer: buffer per (topic, partition), flush barrier, bounded retries
# ---------------------------------------------------------------------------


@dataclass
class WireProducer:
    """Minimal producer with the reference's delivery semantics
    (`producer.zig:111-176` configs; `:286-378` send/flush contract).

    NOT thread-safe by design (one per task/partition — the sink's
    mapInPandas gives each task its own)."""

    host: str
    port: int
    acks: int = -1  # acks=all
    retries: int = 3
    retry_backoff_ms: int = 500
    batch_max_messages: int = 5000  # BATCH_SIZE analog (constants.zig:21)
    # extra bootstrap endpoints beyond (host, port) — a metadata
    # refresh can reach the cluster through ANY live one, like a real
    # client's bootstrap.servers list (r10 verdict K1 tail: leadership
    # moves must be survivable, so routing state is always
    # rediscoverable)
    bootstrap: list[tuple[str, int]] = field(default_factory=list)
    # PEM CA bundle path: set -> every connection is TLS-wrapped with
    # broker-cert verification (the ssl.ca.location axis, V4); None ->
    # PLAINTEXT. Derived from connector options via
    # wire_security_kwargs(kafka_security_options(...)).
    tls_ca: str | None = None
    # SASL credentials (mechanism, username, password) or None; every
    # connection authenticates immediately after connect (and after
    # the TLS wrap for SASL_SSL). Derived from connector options via
    # wire_security_kwargs(kafka_security_options(...)).
    sasl: tuple[str, str, str] | None = None
    delivery_errors: int = 0
    sent: int = 0
    metadata_refreshes: int = 0
    _buf: dict[tuple[str, int], list] = field(default_factory=dict)
    _buf_n: int = 0  # buffered record count (avoids O(P) sum per send)
    # key -> partition memo: CDC keys repeat heavily, and murmur2 is
    # pure Python; bounded (cleared past _PART_CACHE_MAX) so a
    # high-cardinality key stream cannot grow it without limit
    _part_cache: dict[tuple[bytes, int], int] = field(default_factory=dict)
    # dispatched-but-unconfirmed Produce requests, at most one flush's
    # worth (in-flight=1 pipelining): the broker processes batch k
    # while the client encodes batch k+1. Entries:
    # (node, conn | None, corr | None, [(topic, pid, message_set)],
    #  {(topic, pid): record_count}) — conn None marks a dispatch-time
    # connection failure, classified at drain.
    _pending: list = field(default_factory=list)
    _ssl_ctx: object = None  # lazily-built ssl.SSLContext when tls_ca set
    _conn: KafkaConnection | None = None
    # topic -> partition count, resolved once per producer (the topic
    # handle cache analog, K5 `producer.zig:198-227`)
    _npart: dict[str, int] = field(default_factory=dict)
    # cluster routing state from the last metadata response:
    # node_id -> (host, port) and (topic, partition) -> leader node_id
    _brokers: dict[int, tuple[str, int]] = field(default_factory=dict)
    _leaders: dict[tuple[str, int], int] = field(default_factory=dict)
    _node_conns: dict[int, KafkaConnection] = field(default_factory=dict)

    def _ssl_context(self):
        if self.tls_ca is None:
            return None
        if self._ssl_ctx is None:
            import ssl

            self._ssl_ctx = ssl.create_default_context(cafile=self.tls_ca)
        return self._ssl_ctx

    def _new_conn(self, host: str, port: int) -> KafkaConnection:
        return KafkaConnection(
            host, port, ssl_context=self._ssl_context(), sasl=self.sasl
        )

    def _endpoints(self) -> list[tuple[str, int]]:
        """Bootstrap endpoints first, then every broker the last
        metadata named — any one of them can answer a refresh."""
        eps = [(self.host, self.port), *self.bootstrap]
        eps += [hp for hp in self._brokers.values() if hp not in eps]
        return eps

    def _connection(self) -> KafkaConnection:
        """Any live connection (for metadata); walks the endpoint list
        so a dead bootstrap broker does not strand the producer."""
        if self._conn is not None:
            return self._conn
        last: Exception | None = None
        for hp in self._endpoints():
            try:
                self._conn = self._new_conn(*hp)
                return self._conn
            except OSError as e:
                last = e
        raise KafkaWireError(f"no reachable broker in {self._endpoints()}: {last}")

    def _refresh_metadata(self, topic: str) -> None:
        """Re-learn brokers + per-partition leaders — the
        metadata-refresh half of the NotLeader recovery contract
        (reference: librdkafka does this transparently under
        `producer.zig:111-176`'s retry config)."""
        if any(conn is not None for _n, conn, _c, _b, _cnt in self._pending):
            # a synchronous request on a connection with an unread
            # pipelined Produce response would read the wrong frame —
            # confirm outstanding work first (drain swaps _pending out
            # before its own refresh, so this cannot recurse)
            self._drain_pending()
        try:
            md = self._connection().metadata([topic])
        except (OSError, KafkaWireError):
            # the cached metadata connection may BE the dead broker —
            # drop it so the next call walks the endpoint list
            if self._conn is not None:
                self._conn.close()
                self._conn = None
            raise
        self.metadata_refreshes += 1
        self._brokers = dict(md["brokers"])
        tinfo = md["topics"].get(topic)
        if tinfo is None:
            return
        for pid, p in tinfo["partitions"].items():
            self._leaders[(topic, pid)] = p["leader"]
        self._npart[topic] = len(tinfo["partitions"]) or 1

    def _leader_connection(self, topic: str, partition: int) -> KafkaConnection:
        """Connection to the partition's leader. Single-broker layout
        (no routing state) degrades to the plain connection."""
        if (topic, partition) not in self._leaders:
            self._refresh_metadata(topic)
        return self._node_conn(self._route_node(topic, partition))

    def _drop_node_connection(self, node: int | None) -> None:
        """Close the connection a failed produce actually used: the
        per-node one when the route had a live leader, the shared
        metadata connection only on the fallback path (node unknown).
        Dropping ``_conn`` for a per-node failure would kill a healthy
        connection to a different broker (r11 advice)."""
        if node is None:
            if self._conn is not None:
                self._conn.close()
                self._conn = None
            return
        conn = self._node_conns.pop(node, None)
        if conn is not None:
            conn.close()

    def _route_node(self, topic: str, partition: int) -> int | None:
        """The node id a produce for this partition will be sent to,
        or None for the shared fallback connection — the same decision
        `_leader_connection` makes, factored out so grouped flushes
        and failure cleanup agree with it."""
        node = self._leaders.get((topic, partition))
        if node is None or node not in self._brokers:
            return None
        return node

    def _drop_leader_connection(self, topic: str, partition: int) -> None:
        self._drop_node_connection(self._route_node(topic, partition))

    def _node_conn(self, node: int | None) -> KafkaConnection:
        """Connection for an already-resolved route node — the grouped
        dispatch uses this so the connection always matches the node
        the pending entry is tagged with (no re-derivation between
        grouping and dispatch)."""
        if node is None or node not in self._brokers:
            return self._connection()
        conn = self._node_conns.get(node)
        if conn is None:
            conn = self._new_conn(*self._brokers[node])
            self._node_conns[node] = conn
        return conn

    def send(
        self,
        topic: str,
        key: bytes | None,
        value: bytes | None,
        *,
        partition: int | None = None,
        n_partitions: int | None = None,
        timestamp_ms: int | None = None,
    ) -> None:
        """Buffer one record. Partition = explicit, else murmur2 of the
        key over ``n_partitions`` (metadata-resolved when absent).
        Buffering past batch_max_messages flushes inline — the
        queue-full-is-backpressure contract (K2, `producer.zig:286`)."""
        if partition is None:
            if n_partitions is None:
                n_partitions = self._npart.get(topic)
                if n_partitions is None:
                    self._refresh_metadata(topic)
                    n_partitions = self._npart.get(topic)
                if n_partitions is None:
                    # a successful refresh that omits the topic is an
                    # anomaly (no auto-create / ACL hole) — surface it
                    # instead of silently funneling every record to
                    # partition 0 (r11 advice)
                    raise KafkaWireError(
                        f"topic {topic!r} absent from metadata response"
                    )
            ck = (key or b"", n_partitions)
            partition = self._part_cache.get(ck)
            if partition is None:
                partition = partition_for(ck[0], n_partitions)
                if len(self._part_cache) >= _PART_CACHE_MAX:
                    self._part_cache.clear()
                self._part_cache[ck] = partition
        ts = timestamp_ms if timestamp_ms is not None else int(time.time() * 1000)
        self._buf.setdefault((topic, partition), []).append((key, value, ts))
        self._buf_n += 1
        if self._buf_n >= self.batch_max_messages:
            # inline overflow flush (K2 backpressure), pipelined:
            # confirm the PREVIOUS dispatch, then dispatch this batch
            # without waiting — in-flight stays at 1, and the broker
            # appends batch k while this process encodes batch k+1.
            # Delivery is still confirmed before any offset commit:
            # the sink's explicit flush() drains everything (K3).
            self._drain_pending()
            self._dispatch_buffered()

    def flush(self) -> None:
        """Produce every buffered batch and confirm delivery of every
        dispatched one. Raises DeliveryError (after counting it) if
        any batch exhausts its retries — a drained queue is not a
        delivered queue (K3).

        Drain-BEFORE-dispatch is load-bearing: a pipelined dispatch
        from a send() overflow may still be unconfirmed here, and
        dispatching the new buffer first would put two requests in
        flight on one connection — if the first then failed retriably
        while the second appended, the retry would re-append the
        OLDER batch after the newer one, breaking per-partition order
        (the property CDC consumers key on). Confirming the prior
        dispatch first keeps in-flight at exactly 1 everywhere."""
        self._drain_pending()
        self._dispatch_buffered()
        self._drain_pending()

    def _dispatch_buffered(self) -> None:
        """Group buffered batches by partition LEADER and write ONE
        multi-partition Produce request per broker — the protocol's
        native request shape, so a flush over P partitions costs round
        trips proportional to the broker count, not P (the
        request-batching lever the reference gets from librdkafka).
        Responses are NOT read here; ``_drain_pending`` confirms."""
        buf, self._buf = self._buf, {}
        self._buf_n = 0
        if not buf:
            return
        encoded = {
            tp: encode_message_set(msgs) for tp, msgs in buf.items()
        }
        # resolve ALL unknown routes first, THEN group: a refresh for a
        # later topic can move an earlier topic's leader, and grouping
        # mid-refresh would tag a pending entry with a node the dispatch
        # no longer uses — failure cleanup would then close the wrong
        # broker's connection (r12 review finding)
        for topic, partition in encoded:
            if (topic, partition) not in self._leaders:
                try:
                    self._refresh_metadata(topic)
                except (OSError, KafkaWireError):
                    pass  # fallback route; the retry loop re-learns
        by_node: dict[int | None, list[tuple[str, int]]] = {}
        for topic, partition in encoded:
            by_node.setdefault(
                self._route_node(topic, partition), []
            ).append((topic, partition))
        for node, tps in by_node.items():
            batches = [(t, p, encoded[(t, p)]) for t, p in tps]
            counts = {tp: len(buf[tp]) for tp in tps}
            try:
                conn = self._node_conn(node)
                corr = conn.send_request(
                    API_PRODUCE,
                    2,
                    encode_produce_payload(batches, self.acks, 30000),
                )
            except (OSError, KafkaWireError):
                self._drop_node_connection(node)
                self._pending.append((node, None, None, batches, counts))
                continue
            self._pending.append((node, conn, corr, batches, counts))

    def _drain_pending(self) -> None:
        """Read every outstanding Produce response and confirm
        delivery. Any batch that did not land (connection drop,
        NOT_LEADER after a move, injected fault) goes through the
        per-partition bounded-retry loop with the dispatched attempt
        counted against its budget, so the retry / fail-fast contract
        (K6) is unchanged by pipelining."""
        pending, self._pending = self._pending, []
        if not pending:
            return
        # (topic, partition, err, message_set, record_count)
        failed: list[tuple[str, int, int, bytes, int]] = []
        for node, conn, corr, batches, counts in pending:
            if conn is None:  # dispatch-time connection failure
                failed.extend(
                    (t, p, ERR_REQUEST_TIMED_OUT, ms, counts[(t, p)])
                    for t, p, ms in batches
                )
                continue
            try:
                results = parse_produce_response(conn.read_response(corr))
            except (OSError, KafkaWireError):
                self._drop_node_connection(node)
                failed.extend(
                    (t, p, ERR_REQUEST_TIMED_OUT, ms, counts[(t, p)])
                    for t, p, ms in batches
                )
                continue
            for t, p, ms in batches:
                err = results.get((t, p), {}).get(
                    "error", ERR_REQUEST_TIMED_OUT
                )
                if err == ERR_NONE:
                    self.sent += counts[(t, p)]
                else:
                    failed.append((t, p, err, ms, counts[(t, p)]))
        if not failed:
            return
        # slow path: the dispatched attempt counts as attempt 1;
        # refresh once (leadership may have moved) and back off once
        # before the per-partition sweep rather than per batch
        for topic, _p, err, _ms, _c in failed:
            if err not in RETRIABLE_ERRORS:
                self.delivery_errors += 1
                raise DeliveryError(
                    f"produce to {topic} failed with error {err} (non-retriable)"
                )
        try:
            self._refresh_metadata(failed[0][0])
        except (OSError, KafkaWireError):
            pass
        time.sleep(self.retry_backoff_ms / 1000.0)
        for topic, partition, _err, message_set, count in failed:
            self._produce_with_retry(
                topic, partition, message_set, attempt=1
            )
            self.sent += count

    def _produce_with_retry(
        self, topic: str, partition: int, message_set: bytes, *, attempt: int = 0
    ) -> None:
        while True:
            # entering with attempt > 0 means that many attempts were
            # already dispatched (the pipelined path counts its failed
            # dispatch as attempt 1) — the budget check must precede
            # the produce, or a retries=0 producer gets a free extra
            # attempt here (r12 advice finding)
            if attempt > self.retries:
                self.delivery_errors += 1
                raise DeliveryError(
                    f"produce to {topic}[{partition}] failed after "
                    f"{attempt} attempts (retry budget {self.retries} exhausted)"
                )
            try:
                res = self._leader_connection(topic, partition).produce(
                    topic, partition, message_set, acks=self.acks
                )
                err = res["error"]
            except (OSError, KafkaWireError):
                # connection-level failure: retriable like a broker
                # error; drop the route so the retry reconnects
                err = ERR_REQUEST_TIMED_OUT
                self._drop_leader_connection(topic, partition)
            if err == ERR_NONE:
                return
            if err not in RETRIABLE_ERRORS or attempt >= self.retries:
                self.delivery_errors += 1
                raise DeliveryError(
                    f"produce to {topic}[{partition}] failed with error {err} "
                    f"after {attempt + 1} attempts"
                )
            attempt += 1
            if err in (ERR_NOT_LEADER, ERR_REQUEST_TIMED_OUT):
                # leadership may have moved (or the leader died):
                # re-learn the route BEFORE retrying — the
                # metadata-refresh-and-retry path a real client runs
                # on NOT_LEADER_FOR_PARTITION. acks=-1 means the
                # failed attempt was never committed, so the retry is
                # gap-free; a duplicate is possible only if the ACK
                # itself was lost (at-least-once, same as the
                # reference's delivery contract).
                try:
                    self._refresh_metadata(topic)
                except (OSError, KafkaWireError):
                    pass  # next attempt walks the endpoint list again
            time.sleep(self.retry_backoff_ms / 1000.0)

    def close(self) -> None:
        """Socket cleanup only — deliberately does NOT drain pending
        responses: close() runs in finally blocks after a flush() that
        may have already raised, and raising again there would mask
        the original DeliveryError. Unconfirmed dispatches are covered
        by the at-least-once replay (the task failed before the offset
        commit). Callers confirm delivery via flush(), never close()."""
        self._pending.clear()
        if self._conn is not None:
            self._conn.close()
            self._conn = None
        for conn in self._node_conns.values():
            conn.close()
        self._node_conns.clear()


def wire_security_kwargs(options: dict[str, str]) -> dict:
    """Translate the Spark-connector security options rendered by
    `config.kafka_security_options` into WireProducer kwargs, so the
    SAME validated config drives both the production connector and the
    in-sandbox wire client (V4 executed end-to-end, all four
    tls x sasl combinations):

    - PLAINTEXT -> neither;
    - SSL / SASL_SSL -> ``tls_ca`` from kafka.ssl.truststore.location
      (PEM, required);
    - SASL_PLAINTEXT / SASL_SSL -> ``sasl`` = (mechanism, username,
      password) recovered from the rendered JAAS line; only the
      mechanisms the wire client actually speaks (PLAIN,
      SCRAM-SHA-256/512 — the reference's validated set) pass."""
    import re

    proto = options.get("kafka.security.protocol", "PLAINTEXT")
    out: dict = {"tls_ca": None, "sasl": None}
    if proto in ("SSL", "SASL_SSL"):
        loc = options.get("kafka.ssl.truststore.location")
        if not loc or options.get("kafka.ssl.truststore.type") != "PEM":
            raise KafkaWireError(
                f"{proto} requires a PEM truststore "
                "(kafka.ssl.truststore.location/type)"
            )
        out["tls_ca"] = loc
    if proto.startswith("SASL"):
        mech = options.get("kafka.sasl.mechanism")
        if mech not in ("PLAIN", *SCRAM_HASHES):
            raise KafkaWireError(
                f"SASL mechanism {mech!r} is connector-only; the wire "
                f"client speaks PLAIN and {sorted(SCRAM_HASHES)}"
            )
        jaas = options.get("kafka.sasl.jaas.config", "")
        # JAAS string literals escape \ and " with a backslash —
        # match escaped sequences and unescape, mirroring the render
        # in config.kafka_security_options
        lit = r'"((?:[^"\\]|\\.)*)"'
        m = re.search(rf"username={lit}\s+password={lit}", jaas)
        if not m:
            raise KafkaWireError("SASL requires username/password in JAAS")

        def unescape(v: str) -> str:
            return re.sub(r"\\(.)", r"\1", v)

        out["sasl"] = (mech, unescape(m.group(1)), unescape(m.group(2)))
    return out


def consume_all(
    host: str, port: int, topic: str, *, max_wait_s: float = 30.0,
    tls_ca: str | None = None, sasl: tuple[str, str, str] | None = None,
) -> list[dict]:
    """Drain every partition of ``topic`` from offset 0 to the high
    watermark: [{partition, offset, key, value, timestamp_ms}] — the
    consume-all test helper the reference e2e suite uses
    (`src/testing/test_helpers.zig:113-198`)."""
    ctx = None
    if tls_ca is not None:
        import ssl

        ctx = ssl.create_default_context(cafile=tls_ca)
    conn = KafkaConnection(host, port, ssl_context=ctx, sasl=sasl)
    try:
        md = conn.metadata([topic])
        tinfo = md["topics"].get(topic)
        if tinfo is None or tinfo["error"] == ERR_UNKNOWN_TOPIC:
            return []
        out: list[dict] = []
        for pid in sorted(tinfo["partitions"]):
            offset = 0
            deadline = time.monotonic() + max_wait_s
            while True:
                hw, msgs = conn.fetch(topic, pid, offset)
                for m in msgs:
                    out.append({**m, "partition": pid})
                    offset = m["offset"] + 1
                if offset >= hw:
                    break
                if not msgs and time.monotonic() > deadline:
                    raise KafkaWireError(
                        f"stalled consuming {topic}[{pid}] at {offset} < hw {hw}"
                    )
        return out
    finally:
        conn.close()
