"""Shared wire-protocol helpers used by both inputs and outputs
(RESP for redis, the 8-byte-header frame format for nsq). One copy so
a framing fix can't miss a caller; amqp has its own module (amqp091).
"""

from __future__ import annotations

import struct


def resp_encode(*parts: bytes) -> bytes:
    """RESP array-of-bulk-strings (the only form clients send)."""
    out = [b"*%d\r\n" % len(parts)]
    for p in parts:
        out.append(b"$%d\r\n%s\r\n" % (len(p), p))
    return b"".join(out)


def resp_read(rf):
    """Parse one RESP reply (simple/error/integer/bulk/array) from a
    buffered reader."""
    line = rf.readline()
    if not line:
        raise ConnectionError("redis: connection closed")
    t, rest = line[:1], line[1:].strip()
    if t == b"+":
        return rest.decode()
    if t == b"-":
        raise RuntimeError("redis error: %s" % rest.decode())
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n == -1:
            return None
        data = rf.read(n)
        rf.read(2)  # \r\n
        return data
    if t == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [resp_read(rf) for _ in range(n)]
    raise ValueError("redis: bad reply type %r" % t)


def nsq_read_frame(conn, idle_timeout: float | None = None,
                   frame_timeout: float | None = None):
    """Read one nsq frame: uint32 BE size + int32 BE type + data.

    With idle_timeout set, a timeout BEFORE any byte of the frame means
    'no frame pending' and returns None; a timeout AFTER bytes were
    consumed is a protocol error (a half-read frame must never be
    silently treated as idle) and raises. frame_timeout applies once
    the frame has started.
    """
    if idle_timeout is not None:
        conn.settimeout(idle_timeout)
    hdr = b""
    while len(hdr) < 8:
        try:
            chunk = conn.recv(8 - len(hdr))
        except TimeoutError:
            if not hdr and idle_timeout is not None:
                return None  # clean idle: nothing pending
            raise RuntimeError("nsq: timeout mid-frame header") from None
        if not chunk:
            raise ConnectionError("nsq: peer closed mid-reply" if hdr
                                  else "nsq: peer closed")
        hdr += chunk
        if idle_timeout is not None and frame_timeout is not None:
            conn.settimeout(frame_timeout)  # frame started: full budget
    size = struct.unpack(">I", hdr[:4])[0]
    ftype = struct.unpack(">i", hdr[4:8])[0]
    data = b""
    while len(data) < size - 4:
        try:
            chunk = conn.recv(size - 4 - len(data))
        except TimeoutError:
            raise RuntimeError("nsq: timeout mid-frame body") from None
        if not chunk:
            raise ConnectionError("nsq: peer closed mid-frame body")
        data += chunk
    return ftype, data
