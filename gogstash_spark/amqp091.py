"""Minimal AMQP 0-9-1 publisher (no external client library).

Implements exactly the slice of the public AMQP 0-9-1 spec the
reference's amqp output exercises (output/amqp/outputamqp.go:28-66 via
streadway/amqp): PLAIN auth handshake, one channel, exchange.declare,
basic.publish with a content header (optional persistent
delivery-mode), clean close. Frame grammar per the protocol spec
(amqp-0-9-1.pdf / rabbitmq.com/amqp-0-9-1-reference):

    frame = octet(type) short(channel) long(size) payload 0xCE
    method payload = short(class) short(method) args
"""

from __future__ import annotations

import socket
import struct
from urllib.parse import unquote, urlparse

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_END = 1, 2, 3, 0xCE

# (class, method) ids used here
CONN_START, CONN_START_OK = (10, 10), (10, 11)
CONN_TUNE, CONN_TUNE_OK = (10, 30), (10, 31)
CONN_OPEN, CONN_OPEN_OK = (10, 40), (10, 41)
CONN_CLOSE, CONN_CLOSE_OK = (10, 50), (10, 51)
CH_OPEN, CH_OPEN_OK = (20, 10), (20, 11)
CH_CLOSE, CH_CLOSE_OK = (20, 40), (20, 41)
EX_DECLARE, EX_DECLARE_OK = (40, 10), (40, 11)
BASIC_PUBLISH = (60, 40)


def shortstr(s: str) -> bytes:
    b = s.encode()
    if len(b) > 255:
        raise ValueError("shortstr too long")
    return bytes([len(b)]) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("amqp: peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, int, bytes]:
    ftype, channel, size = struct.unpack(">BHI", read_exact(sock, 7))
    payload = read_exact(sock, size)
    if read_exact(sock, 1) != bytes([FRAME_END]):
        raise ValueError("amqp: bad frame end")
    return ftype, channel, payload


def write_frame(sock: socket.socket, ftype: int, channel: int, payload: bytes) -> None:
    sock.sendall(
        struct.pack(">BHI", ftype, channel, len(payload)) + payload + bytes([FRAME_END])
    )


def method(cm: tuple[int, int], args: bytes = b"") -> bytes:
    return struct.pack(">HH", *cm) + args


def parse_method(payload: bytes) -> tuple[tuple[int, int], bytes]:
    c, m = struct.unpack(">HH", payload[:4])
    return (c, m), payload[4:]


class AmqpClosedError(RuntimeError):
    """Broker-initiated Connection/Channel.Close with its reply code."""

    def __init__(self, code: int, msg: str):
        super().__init__(msg)
        self.code = code


class AmqpPublisher:
    """One connection + one channel, the unit a Spark task holds."""

    def __init__(self, url: str, timeout: float = 10.0):
        u = urlparse(url)
        if u.scheme != "amqp":
            raise ValueError("only amqp:// URLs supported (no TLS in this image)")
        host = u.hostname or "localhost"
        port = u.port or 5672
        self.user = unquote(u.username or "guest")
        self.password = unquote(u.password or "guest")
        self.vhost = unquote(u.path[1:]) if len(u.path) > 1 else "/"
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.frame_max = 131072
        self._handshake()
        self._open_channel()

    def _expect(self, cm: tuple[int, int]) -> bytes:
        """Read method frames until cm; fail loudly on Connection.Close."""
        while True:
            ftype, _ch, payload = read_frame(self.sock)
            if ftype != FRAME_METHOD:
                continue  # heartbeat etc.
            got, args = parse_method(payload)
            if got == cm:
                return args
            if got in (CONN_CLOSE, CH_CLOSE):
                code = struct.unpack(">H", args[:2])[0]
                n = args[2]
                scope = "connection" if got == CONN_CLOSE else "channel"
                # acknowledge the close so the broker doesn't linger
                try:
                    write_frame(
                        self.sock, FRAME_METHOD, 0 if got == CONN_CLOSE else _ch,
                        method(CONN_CLOSE_OK if got == CONN_CLOSE else CH_CLOSE_OK),
                    )
                except Exception:
                    pass  # the error below is what the caller needs
                raise AmqpClosedError(
                    code,
                    "amqp %s closed by broker: %d %s"
                    % (scope, code, args[3:3 + n].decode()),
                )

    def _handshake(self) -> None:
        self.sock.sendall(b"AMQP\x00\x00\x09\x01")
        self._expect(CONN_START)
        resp = b"\x00" + self.user.encode() + b"\x00" + self.password.encode()
        start_ok = method(
            CONN_START_OK,
            longstr(b"")                     # client-properties: empty table
            + shortstr("PLAIN") + longstr(resp) + shortstr("en_US"),
        )
        write_frame(self.sock, FRAME_METHOD, 0, start_ok)
        tune = self._expect(CONN_TUNE)
        _ch_max, frame_max, heartbeat = struct.unpack(">HIH", tune[:8])
        if frame_max:
            self.frame_max = min(self.frame_max, frame_max)
        write_frame(
            self.sock, FRAME_METHOD, 0,
            method(CONN_TUNE_OK, struct.pack(">HIH", 0, self.frame_max, 0)),
        )
        write_frame(
            self.sock, FRAME_METHOD, 0,
            method(CONN_OPEN, shortstr(self.vhost) + shortstr("") + b"\x00"),
        )
        self._expect(CONN_OPEN_OK)

    def _open_channel(self) -> None:
        write_frame(self.sock, FRAME_METHOD, 1, method(CH_OPEN, shortstr("")))
        self._expect(CH_OPEN_OK)

    def declare_exchange(
        self, exchange: str, ex_type: str = "direct",
        durable: bool = False, auto_delete: bool = True,
    ) -> None:
        bits = (2 if durable else 0) | (4 if auto_delete else 0)
        args = (
            struct.pack(">H", 0) + shortstr(exchange) + shortstr(ex_type)
            + bytes([bits]) + longstr(b"")   # empty arguments table
        )
        write_frame(self.sock, FRAME_METHOD, 1, method(EX_DECLARE, args))
        self._expect(EX_DECLARE_OK)

    def publish(self, exchange: str, routing_key: str, body: bytes,
                persistent: bool = False) -> None:
        args = struct.pack(">H", 0) + shortstr(exchange) + shortstr(routing_key) + b"\x00"
        write_frame(self.sock, FRAME_METHOD, 1, method(BASIC_PUBLISH, args))
        if persistent:
            flags, props = 0x1000, b"\x02"   # delivery-mode property = 2
        else:
            flags, props = 0, b""
        header = struct.pack(">HHQH", 60, 0, len(body), flags) + props
        write_frame(self.sock, FRAME_HEADER, 1, header)
        chunk = self.frame_max - 8
        for i in range(0, len(body), chunk):
            write_frame(self.sock, FRAME_BODY, 1, body[i:i + chunk])
        # zero-length body: the header's body-size 0 suffices, no body frame

    def close(self) -> None:
        """Graceful goodbye. basic.publish is fire-and-forget (AMQP 0-9-1
        has no per-publish ack without confirm-select), so a broker that
        rejected publishes reports it as a Connection/Channel.Close while
        we await CONN_CLOSE_OK — that error MUST surface so the sink's
        sent count can't include events the broker dropped. Only a
        reply-code 200 race (broker said goodbye first) and socket-level
        errors on an already-dead connection stay best-effort."""
        try:
            write_frame(
                self.sock, FRAME_METHOD, 0,
                method(CONN_CLOSE, struct.pack(">H", 200) + shortstr("bye")
                       + struct.pack(">HH", 0, 0)),
            )
            self._expect(CONN_CLOSE_OK)
        except AmqpClosedError as e:
            if e.code != 200:
                self.sock.close()
                raise
        except Exception:
            pass  # best-effort goodbye; the socket close below is what matters
        finally:
            self.sock.close()
