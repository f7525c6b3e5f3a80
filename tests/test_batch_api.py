"""Batched serving API: compress_many equals per-payload compress."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.packers import native as npack  # noqa: E402
from rspt_tpu.packers import tpu as tpack  # noqa: E402


@pytest.fixture(scope="module")
def payloads(rng):
    ch, n = 3, 8192
    outs = []
    for k in range(4):
        sig = np.cumsum(rng.normal(0, 300 * (k + 1), (ch, n)),
                        axis=1).astype(np.int32)
        outs.append(np.ascontiguousarray(sig.T).astype("<i4").tobytes())
    return ch, n, outs


def test_tpu_batch_matches_single(payloads):
    ch, n, srcs = payloads
    pb = tpack.new_xdelta_hzr(4, ch, n, 3)
    batch_streams = pb.compress_many(srcs)
    for src, got in zip(srcs, batch_streams):
        ps = tpack.new_xdelta_hzr(4, ch, n, 3)
        assert got == ps.compress(src)
        out, _ = ps.decompress(got)
        assert out == src


def test_native_batch_matches_single(payloads):
    ch, n, srcs = payloads
    pb = npack.new_xdelta_hzr(4, ch, n, 3)
    streams = pb.compress_many(srcs)
    outs = pb.decompress_many(streams)
    for src, got, out in zip(srcs, streams, outs):
        ps = npack.new_xdelta_hzr(4, ch, n, 3)
        assert got == ps.compress(src)
        assert bytes(out) == src


def test_empty_batch():
    pb = tpack.new_xdelta_hzr(4, 2, 4096, 3)
    assert pb.compress_many([]) == []
