"""RPC transport hardening (ADVICE r3 #4): the pickle wire format is
internal-trust only, so the trust scope must be enforced in code —
non-loopback binds need an explicit opt-in, and the 8-byte frame length
cannot drive unbounded allocations. In-process, no subprocess spawns, so
these run in the smoke tier."""

import socket
import struct

import numpy as np
import pytest

from quantized_vit_tpu.serve.batching import ContinuousBatcher
from quantized_vit_tpu.serve.rpc import (MAX_MSG_BYTES, RpcServingBackend,
                                         _send_msg)


def _echo_batcher():
    return ContinuousBatcher(lambda images: images.sum(axis=(1, 2, 3))[:, None],
                             max_batch=2, max_delay_ms=1)


def test_non_loopback_bind_refused_without_opt_in():
    with pytest.raises(ValueError, match="allow_remote"):
        RpcServingBackend(_echo_batcher(), host="0.0.0.0")


def test_loopback_binds_fine():
    backend = RpcServingBackend(_echo_batcher(), host="127.0.0.1")
    backend.stop()


def test_oversized_frame_header_drops_connection():
    """A header claiming > MAX_MSG_BYTES must close the connection, not
    allocate what it claims."""
    batcher = _echo_batcher()
    with RpcServingBackend(batcher) as backend:
        sock = socket.create_connection(("127.0.0.1", backend.port),
                                        timeout=10)
        try:
            # claim an 8 EiB body; server must hang up without reading it
            sock.sendall(struct.pack("<Q", 1 << 63))
            sock.settimeout(10)
            assert sock.recv(1) == b""  # orderly close from the server
        finally:
            sock.close()


def test_send_msg_rejects_oversized_payload():
    class _Sink:
        def sendall(self, data):  # pragma: no cover — must not be reached
            raise AssertionError("oversized payload was sent")

    big = np.zeros(MAX_MSG_BYTES + 1024, np.uint8)
    with pytest.raises(ValueError, match="MAX_MSG_BYTES"):
        _send_msg(_Sink(), {"op": "submit", "image": big})
