"""Pallas decoder (interpret mode) vs the Python spec encoder."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.hzr import pallas_decoder, pyref  # noqa: E402


def roundtrip(payloads):
    streams = [pyref.encode(p) for p in payloads]
    outs = pallas_decoder.decode_many(streams, interpret=True)
    for p, o in zip(payloads, outs):
        assert o == p.tobytes()


def test_literals_and_runs(rng):
    data = rng.integers(0, 6, 700).astype(np.uint8)
    data[100:180] = 0
    data[400:420] = 0
    roundtrip([data])


def test_fill_copy_mix(rng):
    fill = np.full(300, 9, np.uint8)
    rnd = rng.integers(0, 256, 400).astype(np.uint8)  # COPY fallback
    lit = rng.integers(0, 4, 500).astype(np.uint8)
    roundtrip([fill, rnd, lit])


def test_multi_stream_shared_batch(rng):
    a = rng.integers(0, 8, 900).astype(np.uint8)
    b = np.zeros(600, np.uint8)
    b[::53] = rng.integers(1, 255, b[::53].size)
    roundtrip([a, b])


def test_long_zero_runs_sparse(rng):
    """Sparse literals with long zero gaps exercise the oversized-chunk
    scatter fallback in placement."""
    data = np.zeros(3000, np.uint8)
    idx = rng.choice(3000, 40, replace=False)
    data[idx] = rng.integers(1, 255, 40)
    roundtrip([data])


def test_deep_codes(rng):
    """Skewed histogram -> some codes deeper than 8 bits (L2 path)."""
    vals = np.concatenate([
        np.repeat(np.arange(1, 40, dtype=np.uint8),
                  np.geomspace(1, 4000, 39).astype(int))])
    rng.shuffle(vals)
    roundtrip([vals])


def test_padding_bit_speculation_regression():
    """Trailing padding bits of a block can decode bogus symbols; their
    emissions must be dropped at the block's output bound (this leaked
    into the NEXT stream's first bytes before the out_limit clamp)."""
    r = np.random.default_rng(4)
    a = r.integers(0, 8, 900).astype(np.uint8)
    b = np.zeros(600, np.uint8)
    b[::53] = r.integers(1, 255, b[::53].size)
    roundtrip([a, b])


def test_deep_codes_on_device():
    """Blocks with deep Huffman codes (smooth byte distributions — the
    real ECG low planes) decode on-device via the nibble-chained LUT
    (8-bit root + 4-bit levels, 24-bit cap >= the 23-bit Fibonacci
    bound) within the default chunk budget — no host routing."""
    rng = np.random.default_rng(11)
    x = rng.normal(0, 30, 200000).astype(np.int32).astype(
        np.uint8).tobytes()
    st = pyref.encode(x)
    src = np.frombuffer(st, np.uint8)
    out = np.zeros(len(x), np.uint8)
    huff = []
    pallas_decoder._walk_stream(src, len(x), 0, out, huff)
    assert huff, "fixture regressed: no HUFF blocks"
    luts = [pallas_decoder.build_lut_nib(t[5]) for t in huff]
    assert all(lut is not None for lut in luts), \
        "deep-code block fell out of the envelope"
    assert all(sum(lut[2]) <= 64 for lut in luts), \
        "deep block exceeds the default device chunk budget"
    got = pallas_decoder.decode_many([st], interpret=True)
    assert got[0] == x


def test_very_deep_codes_on_device():
    """>16-bit codes exercise the 3rd/4th nibble levels."""
    rng = np.random.default_rng(13)
    # geometric symbol distribution: counts halve per symbol, giving a
    # Fibonacci-style skewed tree with >16-bit codes on the cold tail
    x = np.minimum(rng.geometric(0.5, 250000), 255).astype(np.uint8)
    st = pyref.encode(x.tobytes())
    src = np.frombuffer(st, np.uint8)
    huff = []
    pallas_decoder._walk_stream(src, len(x), 0,
                                np.zeros(len(x), np.uint8), huff)
    maxdepth = 0
    for t in huff:
        def depth(nd, b=0):
            if not isinstance(nd, tuple):
                return b
            return max(depth(nd[0], b + 1), depth(nd[1], b + 1))
        maxdepth = max(maxdepth, depth(t[5]))
    got = pallas_decoder.decode_many([st], interpret=True)
    assert got[0] == x.tobytes()
    assert maxdepth > 12, f"fixture too shallow ({maxdepth})"


def test_decode_hints_roundtrip(rng):
    """Aligned-decode hints: a first decode returns the converged
    alignment entries; passing them back pins the entries and skips
    the fixpoint — output stays byte-identical."""
    x = np.where(rng.random(200000) < 0.5,
                 rng.integers(1, 200, 200000), 0).astype(np.uint8)
    st = pyref.encode(x.tobytes())
    outs, hints = pallas_decoder.decode_many([st], interpret=True,
                                             return_hints=True)
    assert outs[0] == x.tobytes()
    assert hints is not None and hints.entries.size > 0
    outs2 = pallas_decoder.decode_many([st], interpret=True, hints=hints)
    assert outs2[0] == x.tobytes()
    # wrong-shape entries are ignored, not trusted
    bad = pallas_decoder.DecodeHints(hints.digest, hints.entries[:8])
    outs3 = pallas_decoder.decode_many([st], interpret=True, hints=bad)
    assert outs3[0] == x.tobytes()


def test_decode_hints_bound_to_content(rng):
    """Hints from stream A must NOT be trusted for a DIFFERENT stream
    of identical sizes/lane layout (the fixed-size-frame serving trap):
    the digest mismatch falls back to the fixpoint and decode stays
    exact."""
    a = np.where(rng.random(200000) < 0.5,
                 rng.integers(1, 200, 200000), 0).astype(np.uint8)
    b = a.copy()
    b[100000:100100] ^= 0x55  # same length, different content
    st_a = pyref.encode(a.tobytes())
    _, hints = pallas_decoder.decode_many([st_a], interpret=True,
                                          return_hints=True)
    st_b = pyref.encode(b.tobytes())
    outs = pallas_decoder.decode_many([st_b], interpret=True,
                                      hints=hints)
    assert outs[0] == b.tobytes()
    # legacy bare-array hints are never trusted
    outs2 = pallas_decoder.decode_many([st_b], interpret=True,
                                       hints=hints.entries)
    assert outs2[0] == b.tobytes()


def test_tier2_sparse_chunk_repack(rng):
    """Dense+sparse mixed payloads: 128-entry chunks of the compacted
    literal stream overspan the 254-word pack windows on the sparse
    blocks and must route through the tier-2 16-entry re-pack (and its
    residual scatter) without byte loss."""
    dense = rng.integers(0, 12, 3 * 65536).astype(np.uint8)
    sparse = np.zeros(2 * 65536, np.uint8)
    idx = rng.choice(sparse.size, 2500, replace=False)
    sparse[idx] = rng.integers(1, 255, idx.size)
    super_sparse = np.zeros(65536, np.uint8)     # gaps > 4 KiB: the
    sidx = np.arange(8, 65536, 5000)             # tier-2 residual path
    super_sparse[sidx] = rng.integers(1, 255, sidx.size)
    roundtrip([dense, sparse, super_sparse])


def test_native_nib_luts_match_python(rng):
    """The native MT nibble-LUT builder (rn_declutnib_batch) must
    reproduce build_lut_nib's arrays EXACTLY — decode_many trusts it
    for device routing, dbits, and the kernel's gather tables."""
    nb = pytest.importorskip("rspt_tpu.native.bindings")
    from rspt_tpu.hzr.jax_decoder import _walk_stream

    payloads = []
    trees = []
    dbits_py = []
    for hi in (4, 16, 64, 200):    # deeper trees as the alphabet grows
        vals = rng.integers(0, hi, 40000).astype(np.uint8)
        vals[rng.random(40000) < 0.35] = 0     # zero runs -> RLE syms
        st = pyref.encode(vals.tobytes())
        src = np.frombuffer(st, np.uint8)
        sz = int.from_bytes(src[:4].tobytes(), "little")
        huff = []
        _walk_stream(src, sz, 0, np.zeros(sz, np.uint8), huff)
        for h in huff:
            payloads.append(h[0])
            trees.append(h[5])
            dbits_py.append(h[2])
    l1b, lvb, nsb, dbb, okb = nb.declutnib_batch(payloads)
    assert len(payloads) >= 4
    for i, tree in enumerate(trees):
        py = pallas_decoder.build_lut_nib(tree)
        assert okb[i] == 0
        assert int(dbb[i]) == dbits_py[i]
        np.testing.assert_array_equal(py[0], l1b[i])
        for k in range(4):
            lv = lvb[i, k, : int(nsb[i, k])].reshape(-1)
            np.testing.assert_array_equal(py[1][k], lv)
