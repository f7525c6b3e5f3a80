"""Batched serving API: compress_many equals per-payload compress."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.packers import native as npack  # noqa: E402
from rspt_tpu.packers import tpu as tpack  # noqa: E402


@pytest.fixture(scope="module")
def payloads():
    rng = np.random.default_rng(1234)
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


def test_batch_mixed_plane_growth(rng):
    """A payload that needs a 4th byte plane grows the count for itself
    and all LATER payloads, but not earlier ones — byte-equal to a
    sequential run of compress() on one packer
    (signal_packer_xdelta_hzr.cpp:59-71 member-state semantics)."""
    ch, n = 2, 4096
    small = np.cumsum(rng.normal(0, 200, (ch, n)), axis=1).astype(np.int32)
    fits = np.ascontiguousarray(small.T).astype("<i4").tobytes()
    big_sig = np.zeros((ch, n), np.int32)
    big_sig[:, 1::2] = 2 ** 24  # deltas of ±2^24 overflow 3 byte planes
    needs4 = np.ascontiguousarray(big_sig.T).astype("<i4").tobytes()
    srcs = [fits, needs4, fits]

    seq = tpack.new_xdelta_hzr(4, ch, n, 3)
    want = [seq.compress(s) for s in srcs]
    assert seq.nr_planes == 4

    pb = tpack.new_xdelta_hzr(4, ch, n, 3)
    got = pb.compress_many(srcs)
    assert got == want
    assert pb.nr_planes == 4

    # roundtrip each stream at the plane count it was encoded with
    for s, stream, planes in zip(srcs, got, (3, 4, 4)):
        pd = tpack.new_xdelta_hzr(4, ch, n, planes)
        out, _ = pd.decompress(stream)
        assert out == s


def test_tpu_decompress_many_device(rng, monkeypatch):
    """TPU packer decompress_many: one batched device decode for all
    payloads, bytes equal per-payload decompress (interp mode)."""
    monkeypatch.setenv("RSPT_DECODER", "interp")
    from rspt_tpu.packers import tpu as tpack

    ch, n, bps = 3, 9000, 4
    sigs = [np.cumsum(rng.normal(0, 200, (ch, n)), axis=1).astype(np.int32)
            for _ in range(3)]
    natives = [np.ascontiguousarray(s.T).astype("<i4").tobytes()
               for s in sigs]
    p = tpack.new_xdelta_hzr(bps, ch, n, 3, device_decode=True)
    comps = [p.compress(nat) for nat in natives]
    outs = p.decompress_many(comps)
    assert outs == natives


def test_tpu_batch8_pipelined_matches_single(payloads):
    """Batch > 4 takes the wave-pipelined entropy path (host tables
    overlapping device pack) — streams must stay byte-identical."""
    ch, n, srcs = payloads
    srcs8 = list(srcs) * 2
    pb = tpack.new_xdelta_hzr(4, ch, n, 3)
    got = pb.compress_many(srcs8)
    for src, g in zip(srcs8, got):
        ps = tpack.new_xdelta_hzr(4, ch, n, 3)
        assert g == ps.compress(src)
        out, _ = ps.decompress(g)
        assert out == src
