"""Protocol sinks: http POST, tcp/unix socket, GELF UDP.

The reference's network outputs ship events one connection per process
(output/http/outputhttp.go, output/socket/outputsocket.go,
output/gelf). Spark-first shape: `df.foreachPartition` — one
connection per TASK, events streamed out of the Arrow batch iterator,
no driver round-trip. At 1000 executors that is 1000 concurrent
writers, which is exactly how a log pipeline fans into an ingest tier.

Each emitter returns the number of events sent (counted task-side via
an accumulator). Events are encoded with codecs.encode_json semantics
(ts rendered UTC as @timestamp, text as message).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gogstash_spark import logevent


def _encoded(df: DataFrame, json_opts: dict | None = None) -> DataFrame:
    from gogstash_spark.codecs import encode_json

    return encode_json(df, **(json_opts or {})).select("encoded")


def http_output(
    df: DataFrame,
    url: str,
    batch_size: int = 100,
    content_type: str = "application/json",
    headers: dict[str, str] | None = None,
    timeout: float = 10.0,
    json_opts: dict | None = None,
) -> int:
    """POST events as NDJSON batches (reference output/http/
    outputhttp.go:30-43 posts per event; batching amortizes the
    round-trip — batch_size=1 reproduces the reference exactly).
    """
    sc = df.sparkSession.sparkContext
    sent = sc.accumulator(0)
    hdrs = {"Content-Type": content_type, **(headers or {})}

    def send_partition(rows):
        import urllib.request

        buf: list[str] = []

        def flush():
            if not buf:
                return
            req = urllib.request.Request(
                url, data=("\n".join(buf) + "\n").encode(), headers=hdrs, method="POST"
            )
            with urllib.request.urlopen(req, timeout=timeout):
                pass
            sent.add(len(buf))
            buf.clear()

        for r in rows:
            buf.append(r["encoded"])
            if len(buf) >= batch_size:
                flush()
        flush()

    _encoded(df, json_opts).foreachPartition(send_partition)
    return int(sent.value)


def socket_output(
    df: DataFrame,
    address: str,
    socket_type: str = "tcp",
    timeout: float = 10.0,
    json_opts: dict | None = None,
) -> int:
    """Newline-delimited JSON over one tcp/unix connection per task
    (reference output/socket/outputsocket.go:18-20,40-70)."""
    sc = df.sparkSession.sparkContext
    sent = sc.accumulator(0)

    def send_partition(rows):
        import socket as so

        if socket_type == "tcp":
            host, _, port = address.rpartition(":")
            conn = so.create_connection((host, int(port)), timeout=timeout)
        elif socket_type in ("unix", "unixpacket"):
            conn = so.socket(so.AF_UNIX, so.SOCK_STREAM)
            conn.settimeout(timeout)
            conn.connect(address)
        else:
            raise ValueError("socket type must be tcp/unix/unixpacket")
        n = 0
        try:
            for r in rows:
                conn.sendall(r["encoded"].encode() + b"\n")
                n += 1
        finally:
            conn.close()
        sent.add(n)

    _encoded(df, json_opts).foreachPartition(send_partition)
    return int(sent.value)


GELF_MAGIC = b"\x1e\x0f"


def _gelf_payload(rec: dict, host: str) -> bytes:
    import gzip

    msg = {
        "version": "1.1",
        "host": host,
        "short_message": rec.get("message") or "",
        "timestamp": rec.get("ts_epoch") or 0.0,
        "level": 6,
    }
    for k, v in rec.items():
        if k not in ("message", "ts_epoch") and v is not None:
            msg["_%s" % k] = v  # GELF extra fields carry a leading _
    return gzip.compress(json.dumps(msg).encode())


GELF_MAX_CHUNKS = 128  # GELF 1.1 spec limit; servers discard beyond it


def gelf_output(
    df: DataFrame,
    address: str,
    chunk_size: int = 1420,
    host: str = "gogstash_spark",
    on_oversize: str = "error",
) -> int:
    """GELF 1.1 over UDP with chunking (reference output/gelf maps
    events to gzip JSON datagrams; payloads over chunk_size split into
    magic + 8-byte id + seq/total chunks; the spec caps a message at
    128 chunks). on_oversize: 'error' fails the task loudly;
    'drop' skips the event (the skip count is in the return value
    deficit vs the input count — never silently sent-and-discarded)."""
    if on_oversize not in ("error", "drop"):
        raise ValueError("on_oversize must be 'error' or 'drop'")
    sc = df.sparkSession.sparkContext
    sent = sc.accumulator(0)
    cols = [c for c in df.columns]

    def send_partition(rows):
        import os as _os
        import socket as so

        h, _, port = address.rpartition(":")
        sock = so.socket(so.AF_INET, so.SOCK_DGRAM)
        n = 0
        for r in rows:
            rec = {}
            for c in cols:
                v = r[c]
                if c == logevent.TEXT:
                    rec["message"] = v
                elif c == logevent.TS:
                    rec["ts_epoch"] = v.timestamp() if v is not None else 0.0
                elif isinstance(v, (str, int, float, bool)) or v is None:
                    rec[c] = v
                else:
                    rec[c] = str(v)
            payload = _gelf_payload(rec, host)
            if len(payload) <= chunk_size:
                sock.sendto(payload, (h, int(port)))
            else:
                chunks = [
                    payload[i : i + chunk_size]
                    for i in range(0, len(payload), chunk_size)
                ]
                if len(chunks) > GELF_MAX_CHUNKS:
                    if on_oversize == "error":
                        raise ValueError(
                            "GELF message needs %d chunks (spec max %d); "
                            "raise chunk_size or trim the event"
                            % (len(chunks), GELF_MAX_CHUNKS)
                        )
                    continue  # drop: reflected in the returned sent count
                mid = _os.urandom(8)
                for i, ck in enumerate(chunks):
                    header = GELF_MAGIC + mid + bytes([i, len(chunks)])
                    sock.sendto(header + ck, (h, int(port)))
            n += 1
        sock.close()
        sent.add(n)

    df.foreachPartition(send_partition)
    return int(sent.value)


def loki_output(
    df: DataFrame,
    url: str,
    labels: dict[str, str] | None = None,
    batch_size: int = 500,
    timeout: float = 10.0,
    json_opts: dict | None = None,
) -> int:
    """Grafana Loki push API: POST {streams: [{stream: labels,
    values: [[ns_epoch, line], ...]}]} per task batch (reference
    output/loki maps events to the same payload). Events without ts
    stamp 0 (Loki rejects those in production — upstream date parse is
    the fix, same as the reference)."""
    sc = df.sparkSession.sparkContext
    sent = sc.accumulator(0)
    lbls = labels or {"job": "gogstash_spark"}

    from gogstash_spark.codecs import encode_json

    ns_col = (
        (F.coalesce(F.unix_micros(F.col(logevent.TS)), F.lit(0)) * F.lit(1000))
        if logevent.TS in df.columns
        else F.lit(0).cast("long")
    )
    enc = encode_json(df, **(json_opts or {})).select(
        F.col("encoded"), ns_col.alias("ns")
    )

    def send_partition(rows):
        import urllib.request

        buf: list[list[str]] = []

        def flush():
            if not buf:
                return
            payload = json.dumps({"streams": [{"stream": lbls, "values": buf}]})
            req = urllib.request.Request(
                url, data=payload.encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout):
                pass
            sent.add(len(buf))
            buf.clear()

        for r in rows:
            buf.append([str(r["ns"]), r["encoded"]])
            if len(buf) >= batch_size:
                flush()
        flush()

    enc.foreachPartition(send_partition)
    return int(sent.value)


NET_OUTPUTS = {
    "http": http_output,
    "socket": socket_output,
    "gelf": gelf_output,
    "loki": loki_output,
}


def emit(df: DataFrame, cfg: dict) -> int:
    """Dispatch a routed frame to a protocol sink by output spec."""
    typ = cfg.get("type")
    timeout = float(cfg.get("timeout", 10.0))
    json_opts = cfg.get("json_opts")
    if typ == "http":
        return http_output(
            df, cfg["url"], batch_size=int(cfg.get("batch_size", 100)),
            content_type=cfg.get("content_type", "application/json"),
            headers=cfg.get("headers"), timeout=timeout, json_opts=json_opts,
        )
    if typ == "socket":
        return socket_output(
            df, cfg["address"], socket_type=cfg.get("socket", "tcp"),
            timeout=timeout, json_opts=json_opts,
        )
    if typ == "gelf":
        return gelf_output(
            df, cfg["address"], chunk_size=int(cfg.get("chunk_size", 1420)),
            host=cfg.get("host", "gogstash_spark"),
            on_oversize=cfg.get("on_oversize", "error"),
        )
    if typ == "loki":
        return loki_output(
            df, cfg["url"], labels=cfg.get("labels"),
            batch_size=int(cfg.get("batch_size", 500)), timeout=timeout,
            json_opts=json_opts,
        )
    raise ValueError("unknown protocol output %r" % typ)
