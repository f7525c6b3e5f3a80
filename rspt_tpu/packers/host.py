"""Host (numpy) signal packers — bit-exact vs the C++ reference.

Four packers over fixed-size buffers shaped
``(bytes_per_sample, nr_channels, nr_samples)``:

* ``HzrPacker``        — lossless, 4 byte planes, no preprocessing
                         (reference: signal_packer_hzr.cpp).
* ``XdeltaHzrPacker``  — lossless: flat delta → offset −128 → xor →
                         N planes, with roundtrip-verify-and-grow
                         (reference: signal_packer_xdelta_hzr.cpp).
* ``DctPacker``        — lossy: per-channel mean removal → O(n²) DCT-II
                         with /quality quantization → delta/offset/xor →
                         2 planes; 3-byte means header
                         (reference: signal_packer_dct.cpp).
* ``HadamardPacker``   — lossy: mean removal → FWHT → /n quantization →
                         3 planes; means header; no delta/xor
                         (reference: signal_packer_hadamard.cpp).

These mirror the reference's object API; the TPU path in
rspt_tpu/parallel builds on the same container functions but runs the
array stages as JAX kernels.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from ..ops import numpy_ops as nops
from . import container

log = logging.getLogger(__name__)


@dataclass
class PackerConfig:
    bytes_per_sample: int
    nr_channels: int
    nr_samples: int

    @property
    def native_size(self) -> int:
        return self.bytes_per_sample * self.nr_channels * self.nr_samples

    @property
    def plane_len(self) -> int:
        return self.nr_channels * self.nr_samples


class _PackerBase:
    def __init__(self, bytes_per_sample: int, nr_channels: int,
                 nr_samples: int, encode_plane=None, decode_plane=None,
                 plane_backend: str = "hzr"):
        self.cfg = PackerConfig(bytes_per_sample, nr_channels, nr_samples)
        self._encode_plane = encode_plane
        self._decode_plane = decode_plane
        if plane_backend not in ("hzr", "lz4", "lz4hc"):
            raise ValueError(f"unknown plane backend {plane_backend!r}")
        # LZ4 planes are marked in the method byte (container.PLANE_LZ4)
        # so decode dispatches without out-of-band knowledge — the live
        # version of the reference's commented-out LZ4 alternate.
        # "lz4hc" selects the hash-chain/lazy matcher (same block
        # format, same flag — streams interoperate with "lz4").
        self._plane_flag = (container.PLANE_LZ4
                            if plane_backend in ("lz4", "lz4hc") else 0)
        if plane_backend == "lz4hc" and encode_plane is None:
            self._encode_plane = container.plane_codec(
                True, self.cfg.plane_len, hc=True)[0]

    @property
    def _method(self) -> int:
        return self.METHOD | self._plane_flag

    def _check_method(self, method: int) -> None:
        if (method & container.METHOD_MASK) != self.METHOD:
            raise ValueError("unsupported compression method")

    def _to_i32(self, src) -> np.ndarray:
        c = self.cfg
        return nops.native_to_i32(src, c.nr_samples, c.nr_channels,
                                  c.bytes_per_sample, False)

    def _to_native(self, enc: np.ndarray) -> bytes:
        return nops.i32_to_native(enc, self.cfg.bytes_per_sample, False)


class HzrPacker(_PackerBase):
    """Lossless 4-plane packer, method byte 0 (signal_packer_hzr.cpp:39-65)."""

    NR_PLANES = 4
    METHOD = 0

    def compress(self, src) -> bytes:
        enc = self._to_i32(src)
        return container.compress_i32(enc, self._method, self.NR_PLANES,
                                      encode_plane=self._encode_plane)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = container.decompress_i32(
            comp, self.NR_PLANES, c.plane_len, 0, self._decode_plane)
        self._check_method(method)
        enc = merged.reshape(c.nr_channels, c.nr_samples)
        return self._to_native(enc), consumed


class XdeltaHzrPacker(_PackerBase):
    """Lossless delta/offset/xor packer with verify-and-grow plane count
    (signal_packer_xdelta_hzr.cpp:34-88). Method byte 0."""

    METHOD = 0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 nr_bytes_to_encode: int, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.nr_planes = int(nr_bytes_to_encode)

    def _preprocess(self, src) -> np.ndarray:
        enc = self._to_i32(src).reshape(-1)
        enc = nops.delta_encode(enc)
        enc = nops.offset32(enc, -128)
        enc = nops.xor_encode(enc)
        return enc

    def _postprocess(self, merged: np.ndarray) -> bytes:
        c = self.cfg
        enc = nops.xor_decode(merged)
        enc = nops.offset32(enc, 128)
        enc = nops.delta_decode(enc, 0)
        return self._to_native(enc.reshape(c.nr_channels, c.nr_samples))

    def compress(self, src) -> bytes:
        src_bytes = bytes(memoryview(src).cast("B")) \
            if not isinstance(src, (bytes, bytearray)) else bytes(src)
        enc = self._preprocess(src_bytes)
        while True:
            # Simulated roundtrip: hzr is lossless, so decode(encode(p))==p;
            # only the plane merge truncation can lose bits. This matches
            # the reference's compress→decompress→memcmp check
            # (signal_packer_xdelta_hzr.cpp:59-71) without re-decoding.
            merged = nops.plane_merge(nops.plane_split(enc, self.nr_planes))
            if self._postprocess(merged) == src_bytes:
                break
            log.info("xdelta_hzr: growing plane count to %d", self.nr_planes + 1)
            self.nr_planes += 1
        return container.compress_i32(
            enc.reshape(self.cfg.nr_channels, self.cfg.nr_samples),
            self._method, self.nr_planes, encode_plane=self._encode_plane)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = container.decompress_i32(
            comp, self.nr_planes, c.plane_len, 0, self._decode_plane)
        self._check_method(method)
        return self._postprocess(merged), consumed


def _means_header(means: np.ndarray) -> bytes:
    """Per-channel 24-bit little-endian means (signal_packer_dct.cpp:120-126)."""
    m = means.astype(np.uint32)
    out = np.zeros((m.size, 3), dtype=np.uint8)
    out[:, 0] = m & 0xFF
    out[:, 1] = (m >> np.uint32(8)) & 0xFF
    out[:, 2] = (m >> np.uint32(16)) & 0xFF
    return out.tobytes()


def _means_from_header(header: bytes, nr_channels: int) -> np.ndarray:
    b = np.frombuffer(header, np.uint8).reshape(nr_channels, 3).astype(np.int64)
    v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
    v = np.where(v >= 1 << 23, v - (1 << 24), v)  # <<8>>8 sign extension
    return v.astype(np.int32)


class DctPacker(_PackerBase):
    """Lossy DCT packer, method byte 1, quality=128, 2 planes
    (signal_packer_dct.cpp:36-156)."""

    METHOD = 1
    NR_PLANES = 2
    QUALITY = 128.0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self._cos = nops.dct_cos_table(nr_samples)
        self._cs = nops.dct_cs(nr_samples)
        # The reference accumulates the DCT serially in double; numpy's
        # pairwise dot can flip the truncated int by 1 ulp-amplified-by-
        # quality. The native kernels replicate the serial order exactly.
        try:
            from ..native import bindings as _rn
            self._dct_fwd = _rn.dct_forward
            self._dct_inv = _rn.dct_inverse
        except Exception:  # pragma: no cover - native build unavailable
            self._dct_fwd = lambda s, ct, cs, q: nops.dct_forward(s, ct, cs, q)
            self._dct_inv = lambda s, ct, cs, q: nops.dct_inverse(s, ct, cs, q)

    def compress(self, src) -> bytes:
        c = self.cfg
        enc = self._to_i32(src)
        means = np.array([nops.average32(enc[i]) for i in range(c.nr_channels)],
                         dtype=np.int32)
        with np.errstate(over="ignore"):
            enc = (enc - means[:, None]).astype(np.int32)
        dct = np.stack([
            self._dct_fwd(enc[j], self._cos, self._cs, self.QUALITY)
            for j in range(c.nr_channels)])
        flat = nops.xor_encode(nops.offset32(
            nops.delta_encode(dct.reshape(-1)), -128))
        return container.compress_i32(
            flat.reshape(c.nr_channels, c.nr_samples), self._method,
            self.NR_PLANES, _means_header(means),
            encode_plane=self._encode_plane)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = container.decompress_i32(
            comp, self.NR_PLANES, c.plane_len, c.nr_channels * 3,
            self._decode_plane)
        self._check_method(method)
        flat = nops.delta_decode(nops.offset32(nops.xor_decode(merged), 128), 0)
        dct = flat.reshape(c.nr_channels, c.nr_samples)
        rec = np.stack([
            self._dct_inv(dct[j], self._cos, self._cs, self.QUALITY)
            for j in range(c.nr_channels)])
        means = _means_from_header(header, c.nr_channels)
        with np.errstate(over="ignore"):
            rec = (rec + means[:, None]).astype(np.int32)
        return self._to_native(rec), consumed


class HadamardPacker(_PackerBase):
    """Lossy FWHT packer, method byte 2, quality=1, 3 planes
    (signal_packer_hadamard.cpp:35-107). nr_samples must be 2^k."""

    METHOD = 2
    NR_PLANES = 3
    QUALITY = 1.0

    def compress(self, src) -> bytes:
        c = self.cfg
        enc = self._to_i32(src)
        means = np.array([nops.average32(enc[i]) for i in range(c.nr_channels)],
                         dtype=np.int32)
        with np.errstate(over="ignore"):
            enc = (enc - means[:, None]).astype(np.int32)
        had = np.stack([
            nops.fwht_normalize(nops.fwht(enc[j]), c.nr_samples, self.QUALITY)
            for j in range(c.nr_channels)])
        return container.compress_i32(
            had, self._method, self.NR_PLANES, _means_header(means),
            encode_plane=self._encode_plane)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = container.decompress_i32(
            comp, self.NR_PLANES, c.plane_len, c.nr_channels * 3,
            self._decode_plane)
        self._check_method(method)
        had = merged.reshape(c.nr_channels, c.nr_samples)
        rec = np.stack([
            nops.fwht_normalize2(nops.fwht(had[j]), self.QUALITY)
            for j in range(c.nr_channels)])
        means = _means_from_header(header, c.nr_channels)
        with np.errstate(over="ignore"):
            rec = (rec + means[:, None]).astype(np.int32)
        return self._to_native(rec), consumed


# Factory API mirroring i_signal_packer (reference: signal_packer.h:59-72).

def new_hzr(bytes_per_sample, nr_channels, nr_samples, **kw):
    return HzrPacker(bytes_per_sample, nr_channels, nr_samples, **kw)


def new_xdelta_hzr(bytes_per_sample, nr_channels, nr_samples,
                   nr_bytes_to_encode, **kw):
    return XdeltaHzrPacker(bytes_per_sample, nr_channels, nr_samples,
                           nr_bytes_to_encode, **kw)


def new_dct(bytes_per_sample, nr_channels, nr_samples, **kw):
    return DctPacker(bytes_per_sample, nr_channels, nr_samples, **kw)


def new_hadamard(bytes_per_sample, nr_channels, nr_samples, **kw):
    return HadamardPacker(bytes_per_sample, nr_channels, nr_samples, **kw)
