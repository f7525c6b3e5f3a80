"""hzr entropy codec: Python spec vs native vs C++ reference oracle."""

import ctypes

import numpy as np
import pytest

from rspt_tpu.formats.crc32c import crc32c
from rspt_tpu.hzr import pyref
from rspt_tpu.native import bindings as rn


def _cases(rng):
    cases = [b"", b"\0", b"\0" * 100, b"\7" * 100,
             bytes(rng.integers(0, 256, 1000, dtype=np.uint8)),
             bytes(rng.integers(0, 4, 100000, dtype=np.uint8)),
             b"\0" * 16662 + b"A" + b"\0" * 16663,
             b"\0" * 65536,
             bytes(rng.integers(0, 256, 65537, dtype=np.uint8)),
             (b"\0\1") * 40000]
    walk = np.cumsum(rng.normal(0, 3, 300000)).astype(np.int32)
    cases += [((walk >> s) & 0xFF).astype(np.uint8).tobytes()
              for s in (0, 8, 16)]
    return cases


def test_crc32c_known_vector():
    # Standard CRC32C test vector.
    assert crc32c(b"123456789") == 0xE3069283
    assert rn.crc32c(np.frombuffer(b"123456789", np.uint8)) == 0xE3069283


def test_crc32c_native_matches_python(rng):
    for n in [0, 1, 7, 8, 9, 100, 4096]:
        d = rng.integers(0, 256, n, dtype=np.uint8)
        assert crc32c(d) == rn.crc32c(d)


def test_pyref_native_identical(rng):
    for data in _cases(rng):
        assert pyref.encode(data) == rn.hzr_encode(data)


def test_roundtrip(rng):
    for data in _cases(rng):
        enc = rn.hzr_encode(data)
        assert rn.hzr_decode(enc) == data
        assert pyref.decode(enc) == data
        assert rn.hzr_verify(enc) == len(data)
        assert pyref.verify(enc) == len(data)


@pytest.fixture(scope="module")
def ref_hzr(ref):
    lib = ctypes.CDLL("build/librspt_ref.so")
    lib.hzr_encode.restype = ctypes.c_int
    lib.hzr_encode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_size_t)]
    lib.hzr_decode.restype = ctypes.c_int
    lib.hzr_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_char_p, ctypes.c_size_t]
    lib.hzr_max_compressed_size.restype = ctypes.c_size_t
    lib.hzr_max_compressed_size.argtypes = [ctypes.c_size_t]

    def encode(data: bytes) -> bytes:
        cap = int(lib.hzr_max_compressed_size(len(data)))
        out = ctypes.create_string_buffer(cap)
        n = ctypes.c_size_t(0)
        assert lib.hzr_encode(data, len(data), out, cap, ctypes.byref(n)) == 1
        return out.raw[:n.value]

    def decode(data: bytes, out_size: int) -> bytes:
        out = ctypes.create_string_buffer(max(out_size, 1))
        assert lib.hzr_decode(data, len(data), out, out_size) == 1
        return out.raw[:out_size]

    return encode, decode


def test_bit_exact_vs_reference(rng, ref_hzr):
    ref_encode, ref_decode = ref_hzr
    for data in _cases(rng):
        expect = ref_encode(data)
        assert pyref.encode(data) == expect
        assert rn.hzr_encode(data) == expect
        # our streams decode in the reference decoder and vice versa
        if data:
            assert ref_decode(expect, len(data)) == data
        assert rn.hzr_decode(expect) == data
