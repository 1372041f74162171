"""dockerlog / dockerstats inputs over the public Docker Engine HTTP API.

The reference delegates to the go-dockerclient daemon poller
(reference input/dockerlog/inputdockerlog.go:22-57 config + start,
input/dockerstats/inputdockerstats.go:22-58); this module speaks the
same public REST API directly over the daemon's unix (or tcp) socket:

  GET /_ping                          liveness (inputdockerlog.go:104)
  GET /containers/json                list (logloop start)
  GET /containers/{id}/logs?...       multiplexed log stream
  GET /containers/{id}/stats?stream=0 one stats sample

Like the other pull inputs (redis/nats/nsq), these are batch DRAINS:
one run collects what the daemon has now and returns a DataFrame;
scheduling reruns is external. The daemon half stays on the edge node,
Spark only parallelizes after createDataFrame — the split that scales.

The non-TTY log endpoint returns Docker's multiplexed stream format
(public API spec): 8-byte header = stream byte (0 stdin / 1 stdout /
2 stderr), 3 zero bytes, uint32 BE payload length, then the payload.
"""

from __future__ import annotations

import json
import re
import socket
import struct

from pyspark.sql import DataFrame, SparkSession


def _parse_docker_url(url: str):
    """('unix', path) or ('tcp', (host, port)) from a dockerurl
    (reference default unix:///var/run/docker.sock,
    inputdockerlog.go:52)."""
    if url.startswith("unix://"):
        return "unix", url[len("unix://"):]
    if url.startswith("tcp://") or url.startswith("http://"):
        rest = url.split("://", 1)[1].rstrip("/")
        host, _, port = rest.partition(":")
        return "tcp", (host, int(port or 2375))
    raise ValueError("unsupported dockerurl %r (unix:// or tcp://)" % url)


def _docker_get(url: str, path: str, timeout: float = 10.0) -> bytes:
    """One GET against the engine API; handles Content-Length and
    chunked bodies (the log endpoint streams chunked)."""
    kind, addr = _parse_docker_url(url)
    if kind == "unix":
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(timeout)
        conn.connect(addr)
        host_hdr = "localhost"
    else:
        conn = socket.create_connection(addr, timeout=timeout)
        host_hdr = "%s:%d" % addr
    try:
        req = (
            "GET %s HTTP/1.1\r\nHost: %s\r\nAccept: */*\r\n"
            "Connection: close\r\n\r\n" % (path, host_hdr)
        )
        conn.sendall(req.encode())
        rf = conn.makefile("rb")
        status_line = rf.readline().decode("latin-1")
        parts = status_line.split(" ", 2)
        code = int(parts[1]) if len(parts) > 1 else 0
        headers: dict[str, str] = {}
        while True:
            ln = rf.readline().decode("latin-1").rstrip("\r\n")
            if not ln:
                break
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        if headers.get("transfer-encoding", "").lower() == "chunked":
            body = b""
            while True:
                size_ln = rf.readline().strip()
                if not size_ln:
                    break
                n = int(size_ln.split(b";")[0], 16)
                if n == 0:
                    rf.readline()
                    break
                chunk = rf.read(n)
                body += chunk
                rf.readline()  # CRLF after chunk
        elif "content-length" in headers:
            body = rf.read(int(headers["content-length"]))
        else:
            body = rf.read()
        if code >= 400:
            raise RuntimeError(
                "docker API %s -> %d: %s" % (path, code, body[:200].decode("utf-8", "replace"))
            )
        return body
    finally:
        conn.close()


def docker_ping(url: str) -> bool:
    """GET /_ping == 'OK' (ping-before-start, inputdockerlog.go:104)."""
    try:
        return _docker_get(url, "/_ping").strip() == b"OK"
    except Exception:
        return False


def demux_docker_log(payload: bytes) -> list[tuple[str, str]]:
    """Docker multiplexed log stream -> [(stream, line)]; stream is
    'stdout'/'stderr'. Frames may hold partial/multiple lines; lines
    are re-assembled per stream (the reference's ContainerLogStream
    buffer, input/dockerlog/stream.go)."""
    names = {0: "stdin", 1: "stdout", 2: "stderr"}
    bufs: dict[str, str] = {}
    out: list[tuple[str, str]] = []
    pos = 0
    while pos + 8 <= len(payload):
        stream_b = payload[pos]
        (n,) = struct.unpack(">I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + n].decode("utf-8", "replace")
        pos += 8 + n
        name = names.get(stream_b, "stdout")
        buf = bufs.get(name, "") + chunk
        *lines, rest = buf.split("\n")
        bufs[name] = rest
        out.extend((name, ln.rstrip("\r")) for ln in lines if ln)
    for name, rest in bufs.items():
        if rest:
            out.append((name, rest.rstrip("\r")))
    return out


def _name_filters(include_patterns, exclude_patterns):
    inc = [re.compile(p) for p in (include_patterns or [])]
    exc = [re.compile(p) for p in (exclude_patterns or [])]

    def valid(names: list[str]) -> bool:
        # reference isValidContainer: any include must match (when
        # given), no exclude may match (default excludes 'gogstash')
        for name in names:
            if any(rx.search(name) for rx in exc):
                return False
        if not inc:
            return True
        return any(rx.search(name) for name in names for rx in inc)

    return valid


def _list_containers(url: str, include_patterns, exclude_patterns) -> list[dict]:
    valid = _name_filters(include_patterns, exclude_patterns)
    containers = json.loads(_docker_get(url, "/containers/json"))
    return [
        c for c in containers
        if valid([n.lstrip("/") for n in c.get("Names", [])])
    ]


class SinceDB:
    """sincedb for dockerlog: last-read unix time per container id
    (reference input/dockerlog/sincedb.go), JSON file, atomic replace.
    `update` mutates memory only; call `save()` once per drain — a
    per-container rewrite would be O(containers^2) bytes per drain, and
    a crash mid-drain just re-reads from the old cursors (at-least-once
    either way)."""

    def __init__(self, path: str | None):
        import os

        self.path = path
        self.state: dict[str, int] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def since(self, cid: str) -> int:
        return int(self.state.get(cid, 0))

    def update(self, cid: str, ts: int) -> None:
        self.state[cid] = int(ts)

    def save(self) -> None:
        import os

        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.state, f)
            os.replace(tmp, self.path)


def _container_log_lines(url: str, cid: str, payload: bytes):
    """Yield (stream, line): a TTY container's /logs is a RAW character
    stream (no 8-byte frame headers — feeding it to the demuxer would
    read log text as frame lengths and garble everything), a non-TTY
    container's is multiplexed. Config.Tty comes from the inspect
    endpoint (the list endpoint doesn't carry it, go-dockerclient's
    RawTerminal handling); a failed inspect falls back to the frame-
    header shape (stream byte 0-2 + three zero bytes — never the start
    of text)."""
    try:
        info = json.loads(_docker_get(url, "/containers/%s/json" % cid))
        tty = bool((info.get("Config") or {}).get("Tty"))
    except Exception:
        tty = not (
            len(payload) >= 8
            and payload[0] in (0, 1, 2)
            and payload[1:4] == b"\x00\x00\x00"
        )
    if tty:
        for ln in payload.decode("utf-8", "replace").splitlines():
            if ln:
                yield "stdout", ln.rstrip("\r")
        return
    yield from demux_docker_log(payload)


def _rfc3339_epoch(s: str) -> int | None:
    """RFC3339Nano docker log prefix -> unix seconds (floor), None when
    the token isn't a timestamp."""
    from datetime import datetime

    if "T" not in s:
        return None
    try:
        # trim nanoseconds to microseconds for fromisoformat
        if "." in s:
            base, _, frac = s.partition(".")
            tz = ""
            for mark in ("Z", "+", "-"):
                ix = frac.find(mark)
                if ix >= 0:
                    tz = frac[ix:]
                    frac = frac[:ix]
                    break
            s = "%s.%s%s" % (base, (frac + "000000")[:6], tz)
        return int(datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp())
    except ValueError:
        return None


def dockerlog_input(
    spark: SparkSession,
    dockerurl: str = "unix:///var/run/docker.sock",
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = ("gogstash",),
    sincepath: str | None = None,
    start_position: str = "beginning",
    host: str | None = None,
) -> DataFrame:
    """Drain every matching container's log into a batch frame with
    the reference's event shape: text + host + containername (+
    containerid, stream) — eventExtra in
    input/dockerlog/logloop.go:25-28. `sincepath` persists a per-
    container last-read timestamp so the next drain starts where this
    one stopped (sincedb.go); start_position='end' skips history on a
    container's FIRST drain (inputdockerlog.go start_position).

    The cursor advances from the DAEMON's own log timestamps
    (timestamps=1, RFC3339Nano prefix stripped from the emitted text),
    never the client clock — a tcp:// remote daemon with clock skew
    would otherwise permanently lose the lines stamped between the two
    clocks. Docker's `since` has second granularity and is inclusive,
    so the last second may replay at the next drain: at-least-once,
    like the reference's sincedb."""
    import time

    if host is None:
        host = socket.gethostname()
    sincedb = SinceDB(sincepath)
    rows: list[tuple] = []
    now = int(time.time())
    for c in _list_containers(dockerurl, include_patterns, exclude_patterns):
        cid = c["Id"]
        name = (c.get("Names") or ["/?"])[0].lstrip("/")
        since = sincedb.since(cid)
        if since == 0 and start_position == "end":
            sincedb.update(cid, now)
            continue
        payload = _docker_get(
            dockerurl,
            "/containers/%s/logs?stdout=1&stderr=1&timestamps=1&since=%d"
            % (cid, since),
        )
        max_ts = 0
        for stream, line in _container_log_lines(dockerurl, cid, payload):
            ts_str, _, rest = line.partition(" ")
            ts = _rfc3339_epoch(ts_str)
            if ts is not None:
                max_ts = max(max_ts, ts)
                line = rest
            rows.append((line, host, name, cid, stream))
        if max_ts:
            sincedb.update(cid, max_ts)
    sincedb.save()
    return spark.createDataFrame(
        rows,
        "text string, host string, containername string, "
        "containerid string, stream string",
    )


_SIMPLE_CLEARED = (
    # filterStatsByMode ModeSimple zeroes these subtrees
    # (input/dockerstats/logloop.go:75-94)
    ("memory_stats", "stats"),
    ("blkio_stats",),
    ("cpu_stats", "cpu_usage", "percpu_usage"),
    ("cpu_stats", "cpu_usage", "usage_in_kernelmode"),
    ("cpu_stats", "cpu_usage", "usage_in_usermode"),
    ("cpu_stats", "system_cpu_usage"),
    ("precpu_stats", "cpu_usage", "percpu_usage"),
    ("precpu_stats", "cpu_usage", "usage_in_kernelmode"),
    ("precpu_stats", "cpu_usage", "usage_in_usermode"),
    ("precpu_stats", "system_cpu_usage"),
)


def _filter_stats_simple(stats: dict) -> dict:
    for path in _SIMPLE_CLEARED:
        node = stats
        for k in path[:-1]:
            node = node.get(k) or {}
        node.pop(path[-1], None)
    for net in (stats.get("networks") or {}).values():
        net.clear()
    stats.pop("network", None)
    return stats


def dockerstats_input(
    spark: SparkSession,
    dockerurl: str = "unix:///var/run/docker.sock",
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = ("gogstash",),
    log_mode: str = "full",
    host: str | None = None,
) -> DataFrame:
    """One stats sample per matching container (stream=0) with the
    reference's event shape: host + containerid + containername +
    stats (input/dockerstats/logloop.go:43-48); log_mode='simple'
    drops the per-cpu/blkio/network detail exactly like
    filterStatsByMode (logloop.go:75-94). The stats document is kept
    as a JSON string column — schema-on-read downstream via the json
    filter, which is how the reference's json codec treats it too."""
    if host is None:
        host = socket.gethostname()
    rows: list[tuple] = []
    for c in _list_containers(dockerurl, include_patterns, exclude_patterns):
        cid = c["Id"]
        name = (c.get("Names") or ["/?"])[0].lstrip("/")
        body = _docker_get(dockerurl, "/containers/%s/stats?stream=0" % cid)
        stats = json.loads(body)
        if log_mode == "simple":
            stats = _filter_stats_simple(stats)
        rows.append((host, cid, name, json.dumps(stats, sort_keys=True)))
    return spark.createDataFrame(
        rows,
        "host string, containerid string, containername string, stats string",
    )
