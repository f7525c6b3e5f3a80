"""Golden numbers published by the reference (README.md / test_5)."""

import numpy as np
import pytest

import rspt_tpu.packers as packers


@pytest.fixture(scope="module")
def readme_sine():
    """The README example signal (rspt_test.cpp:234-236):
    1 ch, 32-bit, 8192 samples of sin(i/100)*1000 truncated to int."""
    i = np.arange(8192)
    vals = (np.sin(i / 100.0) * 1000.0).astype(np.int32)  # C double→int
    return vals.astype("<i4").tobytes()


@pytest.mark.parametrize("engine", ["host", "native"])
def test_readme_xdelta_compressed_size(readme_sine, engine, ref):
    """README.md:85 records compressed_size == 2022 (CR 16.2057) for
    xdelta_hzr(4, 1, 8192, 3). The reference compiled from today's
    sources produces 2028 bytes on this exact signal (the README number
    predates later hzr tweaks); the binding contract is bit-identity
    with the *compiled* reference, plus CR ≈ 16.2 for the README
    claim's spirit."""
    p = packers.new_xdelta_hzr(4, 1, 8192, 3, engine=engine)
    comp = p.compress(readme_sine)
    want, _, _, _ = ref.roundtrip("xdelta_hzr", readme_sine, 4, 1, 8192, 3)
    assert comp == want
    cr = len(readme_sine) / len(comp)
    assert abs(cr - 16.2) < 0.1
    out, consumed = p.decompress(comp)
    assert bytes(out) == readme_sine and consumed == len(comp)


def test_readme_hadamard_quality(readme_sine):
    """README.md:94: hadamard on 16384-sample sine → CR ≈ 52.7,
    PRDN ≈ 2.2% (we regenerate at 16384 as the reference test does,
    rspt_test.cpp:144-147)."""
    from rspt_tpu.utils.metrics import prdn
    i = np.arange(16384)
    vals = (np.sin(i / 100.0) * 1000.0).astype(np.int32)
    native = vals.astype("<i4").tobytes()
    p = packers.new_hadamard(4, 1, 16384, engine="native")
    comp = p.compress(native)
    out, _ = p.decompress(comp)
    rec = np.frombuffer(out, "<i4").astype(np.int32)
    cr = len(native) / len(comp)
    q = prdn(vals[None, :], rec[None, :])
    assert 45 < cr < 60, cr
    assert 1.5 < q < 3.0, q


def test_readme_dct_quality():
    """README.md:98: dct on 4096-sample sine → CR ≈ 142.4, PRDN ≈ 1.5%
    (reference truncates DCT tests to 4096, rspt_test.cpp:148-152)."""
    from rspt_tpu.utils.metrics import prdn
    i = np.arange(4096)
    vals = (np.sin(i / 100.0) * 1000.0).astype(np.int32)
    native = vals.astype("<i4").tobytes()
    p = packers.new_dct(4, 1, 4096, engine="native")
    comp = p.compress(native)
    out, _ = p.decompress(comp)
    rec = np.frombuffer(out, "<i4").astype(np.int32)
    cr = len(native) / len(comp)
    q = prdn(vals[None, :], rec[None, :])
    assert 120 < cr < 165, cr
    assert 1.0 < q < 2.2, q
