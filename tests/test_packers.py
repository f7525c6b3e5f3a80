"""Signal packers: bit-exact compressed streams and reconstructions vs
the compiled C++ reference."""

import numpy as np

from rspt_tpu.packers import host


def _roundtrip_both(ref, kind, src, bps, ch, n, nbytes, make):
    rcomp, rrc, rdec, rlen = ref.roundtrip(kind, src, bps, ch, n, nbytes)
    p = make()
    mcomp = p.compress(src)
    assert mcomp == rcomp, f"{kind}: compressed stream differs"
    mdec, mlen = p.decompress(rcomp)
    assert mlen == rlen
    assert mdec == rdec, f"{kind}: reconstruction differs"
    return rcomp, rdec


def test_xdelta_hzr_sine_readme(ref, sine32):
    _, src = sine32
    comp, dec = _roundtrip_both(ref, "xdelta_hzr", src, 4, 1, 8192, 3,
                                lambda: host.new_xdelta_hzr(4, 1, 8192, 3))
    assert dec == src  # lossless
    cr = len(src) / len(comp)
    assert cr > 15.0  # README.md:85 records CR 16.2 for this signal


def test_hzr_packer(ref, ecg3):
    _, src = ecg3
    comp, dec = _roundtrip_both(ref, "hzr", src, 3, 3, 20000, 0,
                                lambda: host.new_hzr(3, 3, 20000))
    assert dec == src


def test_xdelta_hzr_ecg3(ref, ecg3):
    _, src = ecg3
    comp, dec = _roundtrip_both(ref, "xdelta_hzr", src, 3, 3, 20000, 3,
                                lambda: host.new_xdelta_hzr(3, 3, 20000, 3))
    assert dec == src
    assert len(comp) < len(src)


def test_xdelta_hzr_ecg12(ref, ecg12):
    _, src = ecg12
    comp, dec = _roundtrip_both(ref, "xdelta_hzr", src, 4, 12, 34199, 3,
                                lambda: host.new_xdelta_hzr(4, 12, 34199, 3))
    assert dec == src


def test_xdelta_grow_path(ref, ecg3):
    """Starting with 1 plane forces the verify-and-grow loop
    (signal_packer_xdelta_hzr.cpp:59-71)."""
    _, src = ecg3
    _roundtrip_both(ref, "xdelta_hzr", src, 3, 3, 20000, 1,
                    lambda: host.new_xdelta_hzr(3, 3, 20000, 1))


def test_xdelta_small_widths(ref):
    s16 = (np.sin(np.arange(16384) / 100.0) * 1000.0).astype(np.int16)
    _roundtrip_both(ref, "xdelta_hzr", s16.tobytes(), 2, 1, 16384, 3,
                    lambda: host.new_xdelta_hzr(2, 1, 16384, 3))
    s8 = (np.sin(np.arange(16384) / 100.0) * 100.0).astype(np.int8)
    _roundtrip_both(ref, "xdelta_hzr", s8.tobytes(), 1, 1, 16384, 3,
                    lambda: host.new_xdelta_hzr(1, 1, 16384, 3))


def test_dct_packer(ref, ecg3, sine32):
    _, sine = sine32
    _roundtrip_both(ref, "dct", (np.frombuffer(sine, np.int8)[:4096 * 4]
                                 ).tobytes(), 4, 1, 4096, 0,
                    lambda: host.new_dct(4, 1, 4096))
    sig, src = ecg3
    src4096 = src[:4096 * 3 * 3]
    _roundtrip_both(ref, "dct", src4096, 3, 3, 4096, 0,
                    lambda: host.new_dct(3, 3, 4096))


def test_hadamard_packer(ref, ecg3, sine32):
    _, sine = sine32
    # 8192 = 2^13 samples
    _roundtrip_both(ref, "hadamard", sine, 4, 1, 8192, 0,
                    lambda: host.new_hadamard(4, 1, 8192))
    sig, src = ecg3
    src16384 = src[:16384 * 3 * 3]
    _roundtrip_both(ref, "hadamard", src16384, 3, 3, 16384, 0,
                    lambda: host.new_hadamard(3, 3, 16384))


def test_negative_mean_unsigned_division_quirk(ref, rng):
    """average_32 divides int64 by size_t (unsigned); negative sums wrap.
    (reference: utils.cpp:30-40)"""
    neg = (np.cumsum(rng.normal(-5, 50, (2, 8192)), axis=1) - 30000)
    neg = neg.astype(np.int32)
    src = np.ascontiguousarray(neg.T).tobytes()
    _roundtrip_both(ref, "hadamard", src, 4, 2, 8192, 0,
                    lambda: host.new_hadamard(4, 2, 8192))
    src4 = np.ascontiguousarray(neg[:, :4096].T).tobytes()
    _roundtrip_both(ref, "dct", src4, 4, 2, 4096, 0,
                    lambda: host.new_dct(4, 2, 4096))


def test_native_plane_coder_in_packer(ref, ecg3):
    """Packers accept a pluggable plane codec; the native MT coder must
    produce identical container bytes."""
    from rspt_tpu.native import bindings as rn
    _, src = ecg3
    p = host.new_xdelta_hzr(3, 3, 20000, 3, encode_plane=rn.hzr_encode,
                            decode_plane=rn.hzr_decode)
    comp = p.compress(src)
    rcomp, _, _, _ = ref.roundtrip("xdelta_hzr", src, 3, 3, 20000, 3)
    assert comp == rcomp
    dec, _ = p.decompress(comp)
    assert dec == src


def test_native_mt_dct_bit_exact(rng):
    """Blocked+threaded DCT kernels (rspt_native.cpp rn_dct_*_mt) must be
    bit-identical to the serial-order kernels for any n, including a
    partial final tile (n % 16 != 0)."""
    from rspt_tpu.native import bindings as nb
    from rspt_tpu.ops import numpy_ops as nops
    for ch, n in ((3, 1000), (5, 4096), (1, 17)):
        src = rng.integers(-(1 << 22), 1 << 22, (ch, n), dtype=np.int32)
        cos_t = nops.dct_cos_table(n)
        cs = nops.dct_cs(n)
        q = 128.0
        ref_f = np.stack([nb.dct_forward(src[j], cos_t, cs, q)
                          for j in range(ch)])
        np.testing.assert_array_equal(
            ref_f, nb.dct_forward_mt(src, cos_t, cs, q))
        ref_i = np.stack([nb.dct_inverse(ref_f[j], cos_t, cs, q)
                          for j in range(ch)])
        np.testing.assert_array_equal(
            ref_i, nb.dct_inverse_mt(ref_f, np.ascontiguousarray(cos_t.T),
                                     cs, q))
