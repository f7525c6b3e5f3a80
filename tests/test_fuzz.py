"""Decoder robustness: garbage and corrupted streams must fail
gracefully (no crashes/overruns) and native must agree with the spec
implementation on decodability."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from rspt_tpu.native import bindings as nb
    try:
        nb._load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native runtime unavailable: {e}")
    return nb


def test_garbage_inputs_agree(native, rng):
    from rspt_tpu.hzr import pyref
    for _ in range(400):
        n = int(rng.integers(1, 1500))
        data = rng.integers(0, 256, n, dtype=np.int64).astype(np.uint8)
        try:
            out = native.hzr_decode(data)
        except ValueError:
            out = None
        try:
            out2 = pyref.decode(data)
        except Exception:
            out2 = None
        assert (out is None) == (out2 is None)
        if out is not None:
            assert out == out2


def test_corrupted_streams_no_crash(native, rng):
    from rspt_tpu.hzr import pyref
    for _ in range(300):
        n = int(rng.integers(10, 4000))
        payload = rng.integers(0, 30, n, dtype=np.int64).astype(np.uint8)
        comp = bytearray(pyref.encode(payload))
        for _ in range(int(rng.integers(1, 4))):
            comp[rng.integers(0, len(comp))] ^= int(rng.integers(1, 256))
        try:
            native.hzr_decode(bytes(comp))
        except ValueError:
            pass  # graceful failure is fine; crashing is not


def test_verify_catches_corruption(native, rng):
    """hzr_verify (the CRC checker the packers deliberately skip,
    matching the reference) must flag payload corruption."""
    payload = rng.integers(0, 20, 5000, dtype=np.int64).astype(np.uint8)
    from rspt_tpu.hzr import pyref
    comp = bytearray(pyref.encode(payload))
    assert native.hzr_verify(bytes(comp)) == payload.size
    comp[len(comp) // 2] ^= 0x55
    with pytest.raises(ValueError):
        native.hzr_verify(bytes(comp))


def test_pallas_decoder_corrupted_no_crash(rng):
    """The device decoder must fail gracefully (or produce garbage like
    the reference — hzr_decode skips CRC) on corrupted streams, never
    crash or overrun. Fewer iterations than the native fuzz: interpret
    mode pays a trace per lane-layout shape."""
    from rspt_tpu.hzr import pallas_decoder, pyref
    for _ in range(25):
        n = int(rng.integers(3000, 40000))
        payload = rng.integers(0, 30, n, dtype=np.int64).astype(np.uint8)
        comp = bytearray(pyref.encode(payload))
        for _ in range(int(rng.integers(1, 4))):
            comp[rng.integers(0, len(comp))] ^= int(rng.integers(1, 256))
        try:
            out = pallas_decoder.decode_many([bytes(comp)],
                                             interpret=True)
            assert len(out) == 1
        except (ValueError, IndexError):
            pass  # graceful failure is fine; crashing is not
