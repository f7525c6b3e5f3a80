"""Pallas kernels vs the numpy oracles (interpret mode on CPU)."""

import numpy as np
import pytest

pytest.importorskip("jax")
import jax  # noqa: E402

from rspt_tpu.ops import numpy_ops as nops  # noqa: E402
from rspt_tpu.ops import pallas_kernels as pk  # noqa: E402

INTERP = jax.default_backend() != "tpu"


def test_fwht_pallas_matches(rng):
    x = rng.integers(-(2**23), 2**23, (6, 4096),
                     dtype=np.int64).astype(np.int32)
    got = np.asarray(pk.fwht_pallas(x, interpret=INTERP))
    want = np.stack([nops.fwht(r) for r in x])
    np.testing.assert_array_equal(got, want)


def test_fwht_pallas_wraparound():
    x = np.array([[2**31 - 1, -(2**31), 7, -9]], np.int32)
    got = np.asarray(pk.fwht_pallas(x, interpret=INTERP))
    np.testing.assert_array_equal(got, nops.fwht(x[0])[None])


def test_xdelta_fused_matches(rng):
    for n in (100, 65536, 200000):
        x = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        got = np.asarray(pk.xdelta_preprocess_pallas(x, interpret=INTERP))
        want = nops.xor_encode(nops.offset32(nops.delta_encode(x), -128))
        np.testing.assert_array_equal(got, want)


def test_interp_pack_path_bit_exact(rng, monkeypatch):
    """The fused Pallas pack path (token_values_pallas LUT/prefix kernel
    + pack_bits_pallas placement) is byte-identical to the Python spec
    in interpreter mode (hzr_encode.c:411-457 semantics)."""
    from rspt_tpu.hzr import jax_coder, pyref
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    cases = [
        rng.choice(np.frombuffer(b"the quick brown fox 0123", np.uint8),
                   50000).astype(np.uint8),
        np.concatenate([np.concatenate([
            np.full(r, 0, np.uint8),
            rng.integers(1, 256, 17, np.int64).astype(np.uint8)])
            for r in (1, 2, 3, 6, 7, 22, 23, 278, 279, 16662, 40000)]),
        rng.integers(0, 256, 70000, np.int64).astype(np.uint8),
        rng.integers(0, 5, 100, np.int64).astype(np.uint8),
        np.zeros(5000, np.uint8),
    ]
    for data in cases:
        assert jax_coder.encode(data) == pyref.encode(data)


def test_tokenize_planes_pallas_matches(rng):
    """Fused plane-extract+tokenize kernel vs tokenize_blocks oracle
    (hzr_encode.c:133-173 run semantics) across plane counts and
    tails, including runs crossing tile rows and the MAX_ZERO_RUN cap."""
    import jax.numpy as jnp
    from rspt_tpu.hzr import jax_coder

    B = jax_coder.B
    for planes, plane_len in [(3, 2 * B + 17172), (1, 1000), (4, B),
                              (2, B + 1)]:
        n = plane_len
        x = rng.integers(-(2**23), 2**23, n, dtype=np.int64)
        x[rng.random(n) < 0.6] = 0        # long-ish zero runs
        zr = min(n, 17000)
        x[:zr] = 0                        # > MAX_ZERO_RUN run
        x = x.astype(np.int32)

        tokw, bwords = pk.tokenize_planes_pallas(
            jnp.asarray(x), planes, plane_len, interpret=INTERP)
        tokw = np.asarray(tokw)
        blocks_got = np.asarray(jax.lax.bitcast_convert_type(
            bwords, jnp.uint8)).reshape(tokw.shape[0], -1)

        # oracle: plane split + blockify + tokenize
        nb_per = max(1, -(-plane_len // B))
        lengths = np.full(planes * nb_per, B, np.int32)
        if plane_len % B:
            lengths[nb_per - 1::nb_per] = plane_len % B
        pl_bytes = np.stack([((x.astype(np.uint32) >> (8 * k)) & 0xFF)
                             .astype(np.uint8) for k in range(planes)])
        padded = np.zeros((planes, nb_per * B), np.uint8)
        padded[:, :plane_len] = pl_bytes
        blocks = padded.reshape(planes * nb_per, B)
        syms, extras, ebits, tvalid, hist = (
            np.asarray(a) for a in jax_coder.tokenize_blocks(
                jnp.asarray(blocks), jnp.asarray(lengths)))

        np.testing.assert_array_equal(blocks_got, blocks)
        np.testing.assert_array_equal(tokw & 511,
                                      np.where(tvalid, syms, 0) |
                                      np.where(~tvalid & (syms != 0), 0, 0))
        np.testing.assert_array_equal((tokw >> 27) & 1, tvalid)
        np.testing.assert_array_equal(
            np.where(tvalid, (tokw >> 9) & 15, 0),
            np.where(tvalid, ebits, 0))
        np.testing.assert_array_equal(
            np.where(tvalid, (tokw >> 13) & 16383, 0),
            np.where(tvalid, extras, 0))
        hist_got = np.asarray(jax_coder.hist_from_tokw(
            jnp.asarray(tokw)))
        np.testing.assert_array_equal(hist_got, hist)


def test_fused_pass1_stream_bit_exact(rng, monkeypatch):
    """Full TPU-engine compress through the fused pass-1 (interpret
    mode) is byte-identical to the host engine."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    # unusual shape: dodges stale lru_cache entries built without the
    # fused env flag earlier in the session
    ch, n, bps = 3, 23456, 4
    sig = np.cumsum(rng.normal(0, 400, (ch, n)), axis=1).astype(np.int32)
    native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
    p = tpack.new_xdelta_hzr(bps, ch, n, 3)
    comp = p.compress(native)
    ph = hpack.new_xdelta_hzr(bps, ch, n, 3)
    assert comp == ph.compress(native)
    out, _ = p.decompress(comp)
    assert out == native


def test_flat_pack_fill_and_copy_routing(rng, monkeypatch):
    """The flat-exact pack path (host_layout + pack_tokens_flat):
    FILL blocks (constant high planes) splice host-side with no device
    writes; COPY-fallback blocks (incompressible planes) route to the
    old per-block path. Both byte-identical to the host engine."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    ch, n, bps = 2, 19000, 4
    # tiny amplitude: planes 1-2 constant after xdelta -> FILL blocks
    sig = (rng.normal(0, 2, (ch, n))).astype(np.int32)
    native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
    p = tpack.new_xdelta_hzr(bps, ch, n, 3)
    comp = p.compress(native)
    assert comp == hpack.new_xdelta_hzr(bps, ch, n, 3).compress(native)
    out, _ = p.decompress(comp)
    assert out == native

    # incompressible low plane -> COPY fallback (old path, any_copy)
    ch2, n2 = 2, 17011
    sig2 = rng.integers(-(1 << 23), 1 << 23, (ch2, n2)).astype(np.int32)
    native2 = np.ascontiguousarray(sig2.T).astype("<i4").tobytes()
    p2 = tpack.new_xdelta_hzr(bps, ch2, n2, 4)
    comp2 = p2.compress(native2)
    assert comp2 == hpack.new_xdelta_hzr(bps, ch2, n2, 4).compress(native2)
    out2, _ = p2.decompress(comp2)
    assert out2 == native2


def test_flat_pack_fuzz_shapes(rng, monkeypatch):
    """Flat exact-offset pack across varied shapes/statistics (interp):
    byte-identical to the host engine, including multi-block planes,
    odd tails, FILL-heavy and near-random payloads."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    cases = [
        (1, 70001, 4, 2, 900.0),    # multi-block single channel
        (5, 13000, 4, 3, 3.0),      # tiny amplitude (FILL planes)
        (2, 33333, 4, 4, 2e6),      # wide dynamic range
        (3, 8192, 2, 2, 120.0),     # 16-bit samples
        (7, 11111, 4, 1, 0.4),      # 1 plane, near-constant
    ]
    for ch, n, bps, planes, sigma in cases:
        sig = np.cumsum(rng.normal(0, sigma, (ch, n)), axis=1)
        sig = sig.astype(np.int32)
        if bps < 4:
            sig >>= 16
        native = np.ascontiguousarray(sig.T).astype(f"<i{bps}").tobytes()
        pt = tpack.new_xdelta_hzr(bps, ch, n, planes)
        ph = hpack.new_xdelta_hzr(bps, ch, n, planes)
        comp_t, comp_h = pt.compress(native), ph.compress(native)
        assert comp_t == comp_h, (ch, n, bps, planes, sigma)
        out, _ = pt.decompress(comp_t)
        assert out == native, (ch, n, bps, planes, sigma)


def test_flat_pack_split_compaction(rng, monkeypatch):
    """The chunked compaction (large-batch VMEM guard) produces the
    identical stream: force tiny chunks on a normal payload."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    orig_plan = jax_coder.compact_split_plan
    monkeypatch.setattr(
        jax_coder, "compact_split_plan",
        lambda hist, huff, cap_tokens=0: orig_plan(
            hist, huff, cap_tokens=jax_coder.GROUP_TOK_FLAT))
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    ch, n, bps = 3, 21000, 4
    sig = np.cumsum(rng.normal(0, 300, (ch, n)), axis=1).astype(np.int32)
    native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
    comp = tpack.new_xdelta_hzr(bps, ch, n, 3).compress(native)
    assert comp == hpack.new_xdelta_hzr(bps, ch, n, 3).compress(native)


def test_fused_hzr_packer_bit_exact(rng, monkeypatch):
    """The plain hzr packer (4 planes, no preprocessing) through the
    fused tokenizer + flat pack equals the host engine."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    ch, n, bps = 3, 17777, 4
    sig = np.cumsum(rng.normal(0, 250, (ch, n)), axis=1).astype(np.int32)
    native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
    p = tpack.new_hzr(bps, ch, n)
    comp = p.compress(native)
    assert comp == hpack.new_hzr(bps, ch, n).compress(native)
    out, _ = p.decompress(comp)
    assert out == native


def test_fused_transform_packers_bit_exact(rng, monkeypatch):
    """DCT and Hadamard packers through the fused tokenizer tail + flat
    pack equal the host engine (lossy transforms themselves run the
    strict-parity native kernels in both)."""
    monkeypatch.setenv("RSPT_FUSED_PASS1", "interp")
    from rspt_tpu.hzr import jax_coder
    monkeypatch.setattr(jax_coder, "_PACK_MODE", "interp")
    from rspt_tpu.packers import host as hpack
    from rspt_tpu.packers import tpu as tpack

    ch, n = 2, 4096
    sig = np.cumsum(rng.normal(0, 150, (ch, n)), axis=1).astype(np.int32)
    native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
    for mk_t, mk_h in ((tpack.new_dct, hpack.new_dct),
                       (tpack.new_hadamard, hpack.new_hadamard)):
        pt, ph = mk_t(4, ch, n), mk_h(4, ch, n)
        comp = pt.compress(native)
        assert comp == ph.compress(native), mk_t.__name__
        out, _ = pt.decompress(comp)
        assert out == ph.decompress(ph.compress(native))[0]
