"""Parity for 1- and 2-byte samples (the reference's test_2/3/4 vary
bytes-per-sample; engines must agree with the oracle on all of them)."""

import numpy as np
import pytest

import rspt_tpu.packers as packers


def make_native(rng, ch, n, bps):
    lim = 2 ** (8 * bps - 1) - 1
    t = np.arange(n)
    sig = (0.7 * lim * np.sin(t / 60.0)[None, :]
           + rng.normal(0, max(2, lim // 100), (ch, n))).astype(np.int64)
    sig = np.clip(sig, -lim - 1, lim).astype(np.int32)
    v = np.ascontiguousarray(sig.T).astype(np.uint32)
    b = np.zeros((n, ch, bps), np.uint8)
    for k in range(bps):
        b[..., k] = (v >> np.uint32(8 * k)) & np.uint32(0xFF)
    return b.reshape(-1).tobytes()


@pytest.mark.parametrize("bps", [1, 2])
@pytest.mark.parametrize("engine", ["native", "host", "tpu"])
def test_xdelta_small_bps(ref, rng, bps, engine):
    if engine == "tpu":
        pytest.importorskip("jax")
    ch, n = 2, 4096
    native = make_native(rng, ch, n, bps)
    nbytes = min(bps + 1, 4)
    want, rc, want_out, _ = ref.roundtrip("xdelta_hzr", native, bps, ch, n,
                                          nbytes)
    p = packers.new_xdelta_hzr(bps, ch, n, nbytes, engine=engine)
    comp = p.compress(native)
    assert comp == want
    out, _ = p.decompress(comp)
    assert bytes(out) == want_out == native


@pytest.mark.parametrize("bps", [1, 2])
def test_hzr_small_bps(ref, rng, bps):
    ch, n = 3, 2048
    native = make_native(rng, ch, n, bps)
    want, rc, want_out, _ = ref.roundtrip("hzr", native, bps, ch, n)
    p = packers.new_hzr(bps, ch, n, engine="native")
    comp = p.compress(native)
    assert comp == want
    out, _ = p.decompress(comp)
    assert bytes(out) == native
