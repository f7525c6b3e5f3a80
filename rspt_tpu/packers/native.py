"""All-native packer engine — every stage in the C++ host runtime.

The low-latency engine of the framework: layout swizzle, xdelta scans,
byte planes, transforms and the hzr entropy stage all run in
librspt_native with plane/block-level multithreading. Byte-identical to
the other engines and the C++ reference, ~3x the reference's
single-threaded throughput on a 4-core host.

Engine selection guidance (see packers/__init__.py factories):
* native — streaming / small payloads / hosts without accelerators, or
  when the accelerator link is high-latency (each device round trip
  costs more than the whole native encode).
* tpu    — sharded batch compression co-located with TPUs; the device
  pipeline is ~1-5 ms per 1.6 MB of compute but needs a fast link.
* host   — pure numpy/Python reference engine (oracle, debugging).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..native import bindings as nb
from ..ops import numpy_ops as nops
from .host import PackerConfig, _means_header, _means_from_header

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        _LIB = nb._load()
    return _LIB


class _NativeBase:
    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 nthreads: int = 0):
        self.cfg = PackerConfig(bytes_per_sample, nr_channels, nr_samples)
        self.nthreads = nthreads

    def _entropy(self, flat_i32: np.ndarray, nr_planes: int, method: int,
                 header: bytes = b"") -> bytes:
        planes = nb.plane_split(flat_i32, nr_planes)
        body = nb.encode_planes_blocks_mt(planes, self.nthreads)
        return bytes([method]) + header + body

    def _decode_planes(self, comp, nr_planes: int, header_size: int):
        c = self.cfg
        buf = np.frombuffer(memoryview(bytes(comp))
                            if not isinstance(comp, (bytes, bytearray))
                            else memoryview(comp), np.uint8)
        method = int(buf[0])
        header = buf[1:1 + header_size].tobytes()
        planes, consumed = nb.decode_planes_blocks_mt(
            buf[1 + header_size:], nr_planes, c.plane_len, self.nthreads)
        merged = nb.plane_merge(planes)
        return method, header, merged, 1 + header_size + consumed


class NativeHzrPacker(_NativeBase):
    """signal_packer_hzr.cpp parity, all stages native."""

    NR_PLANES = 4
    METHOD = 0

    def compress(self, src) -> bytes:
        c = self.cfg
        enc = nb.native_to_i32(src, c.nr_samples, c.nr_channels,
                               c.bytes_per_sample)
        return self._entropy(enc.reshape(-1), self.NR_PLANES, self.METHOD)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = self._decode_planes(
            comp, self.NR_PLANES, 0)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        out = nb.i32_to_native(merged.reshape(c.nr_channels, c.nr_samples),
                               c.bytes_per_sample)
        return out, consumed


class NativeXdeltaHzrPacker(_NativeBase):
    """signal_packer_xdelta_hzr.cpp parity, all stages native."""

    METHOD = 0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 nr_bytes_to_encode: int, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.nr_planes = int(nr_bytes_to_encode)

    def _preprocess(self, src) -> np.ndarray:
        c = self.cfg
        enc = nb.native_to_i32(src, c.nr_samples, c.nr_channels,
                               c.bytes_per_sample)
        flat = np.ascontiguousarray(enc.reshape(-1))
        L = _lib()
        L.rn_delta_encode(nb._p32(flat), flat.size)
        L.rn_offset32(nb._p32(flat), flat.size, -128)
        L.rn_xor_encode(nb._p32(flat), flat.size)
        return flat

    def compress(self, src) -> bytes:
        c = self.cfg
        # fused MT swizzle+delta+offset+xor+plane-split+fit in one pass;
        # verify-and-grow (signal_packer_xdelta_hzr.cpp:59-71) retries
        # with one more plane until every value sign-extends
        while True:
            planes, fits = nb.xdelta_preprocess_mt(
                src, c.nr_samples, c.nr_channels, c.bytes_per_sample,
                self.nr_planes, self.nthreads)
            if fits:
                break
            self.nr_planes += 1
        body = nb.encode_planes_blocks_mt(planes, self.nthreads)
        return bytes([self.METHOD]) + body

    def compress_many(self, srcs) -> list:
        """Batched path: payloads run through the MT kernels one after
        another (each already saturates the cores); a verify-grow
        raises the instance plane count for subsequent payloads, like
        sequential reference calls on one instance."""
        return [self.compress(s) for s in srcs]

    def decompress_many(self, comps) -> list:
        return [self.decompress(c)[0] for c in comps]

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        buf = np.frombuffer(memoryview(bytes(comp))
                            if not isinstance(comp, (bytes, bytearray))
                            else memoryview(comp), np.uint8)
        method = int(buf[0])
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        planes, consumed = nb.decode_planes_blocks_mt(
            buf[1:], self.nr_planes, c.plane_len, self.nthreads)
        out = nb.xdelta_postprocess_mt(planes, c.nr_samples, c.nr_channels,
                                       c.bytes_per_sample, self.nthreads)
        return out, 1 + consumed


class NativeDctPacker(_NativeBase):
    """signal_packer_dct.cpp parity (serial-f64 transform)."""

    METHOD = 1
    NR_PLANES = 2
    QUALITY = 128.0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self._cos = nops.dct_cos_table(nr_samples)
        self._cs = nops.dct_cs(nr_samples)
        # inverse tiles read the transposed table (identical values,
        # contiguous rows — see rspt_native.cpp rn_dct_inverse_mt)
        self._cos_t = np.ascontiguousarray(self._cos.T)

    def compress(self, src) -> bytes:
        c = self.cfg
        enc = nb.native_to_i32(src, c.nr_samples, c.nr_channels,
                               c.bytes_per_sample)
        means = np.array([nops.average32(enc[i])
                          for i in range(c.nr_channels)], np.int32)
        with np.errstate(over="ignore"):
            enc = (enc - means[:, None]).astype(np.int32)
        dct = nb.dct_forward_mt(enc, self._cos, self._cs, self.QUALITY,
                                self.nthreads)
        flat = np.ascontiguousarray(dct.reshape(-1))
        L = _lib()
        L.rn_delta_encode(nb._p32(flat), flat.size)
        L.rn_offset32(nb._p32(flat), flat.size, -128)
        L.rn_xor_encode(nb._p32(flat), flat.size)
        return self._entropy(flat, self.NR_PLANES, self.METHOD,
                             _means_header(means))

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_planes(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        flat = np.ascontiguousarray(merged)
        L = _lib()
        L.rn_xor_decode(nb._p32(flat), flat.size)
        L.rn_offset32(nb._p32(flat), flat.size, 128)
        L.rn_delta_decode(nb._p32(flat), flat.size, 0)
        dct = flat.reshape(c.nr_channels, c.nr_samples)
        rec = nb.dct_inverse_mt(dct, self._cos_t, self._cs, self.QUALITY,
                                self.nthreads)
        means = _means_from_header(header, c.nr_channels)
        with np.errstate(over="ignore"):
            rec = (rec + means[:, None]).astype(np.int32)
        out = nb.i32_to_native(rec, c.bytes_per_sample)
        return out, consumed


class NativeHadamardPacker(_NativeBase):
    """signal_packer_hadamard.cpp parity."""

    METHOD = 2
    NR_PLANES = 3
    QUALITY = 1.0

    def compress(self, src) -> bytes:
        c = self.cfg
        enc = nb.native_to_i32(src, c.nr_samples, c.nr_channels,
                               c.bytes_per_sample)
        means = np.array([nops.average32(enc[i])
                          for i in range(c.nr_channels)], np.int32)
        with np.errstate(over="ignore"):
            enc = (enc - means[:, None]).astype(np.int32)
        had = np.stack([
            nb.fwht_normalize(nb.fwht(enc[j]), c.nr_samples, self.QUALITY)
            for j in range(c.nr_channels)])
        return self._entropy(np.ascontiguousarray(had.reshape(-1)),
                             self.NR_PLANES, self.METHOD,
                             _means_header(means))

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_planes(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        had = merged.reshape(c.nr_channels, c.nr_samples)
        rec = np.stack([nb.fwht_normalize2(nb.fwht(had[j]), self.QUALITY)
                        for j in range(c.nr_channels)])
        means = _means_from_header(header, c.nr_channels)
        with np.errstate(over="ignore"):
            rec = (rec + means[:, None]).astype(np.int32)
        out = nb.i32_to_native(rec, c.bytes_per_sample)
        return out, consumed


def new_hzr(bps, ch, n, **kw):
    return NativeHzrPacker(bps, ch, n, **kw)


def new_xdelta_hzr(bps, ch, n, nr_bytes_to_encode, **kw):
    return NativeXdeltaHzrPacker(bps, ch, n, nr_bytes_to_encode, **kw)


def new_dct(bps, ch, n, **kw):
    return NativeDctPacker(bps, ch, n, **kw)


def new_hadamard(bps, ch, n, **kw):
    return NativeHadamardPacker(bps, ch, n, **kw)
