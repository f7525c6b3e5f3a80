"""TPU-path signal packers — device pipeline, host-identical streams.

Same container formats as packers/host.py (and the C++ reference), but
every array stage runs on the accelerator:

  native bytes ──(device)── layout swizzle → preprocess (xdelta scans /
  DCT matmul / FWHT butterflies) → byte-plane split → tokenize+histogram
  ──(host: per-block Huffman tables)── (device) code lookup + bit pack
  ──(host: headers/CRC/concat)── container bytes

All byte-planes' 64 KiB blocks are batched into ONE device call per
pass (the data-parallel axis the mesh shards — parallel/mesh.py).
Decompression entropy-decode is bit-serial per block and runs on the
host native C++ runtime (multithreaded), with plane merge and inverse
transforms back on device.

Reference parity: signal_packer_hzr.cpp / signal_packer_xdelta_hzr.cpp /
signal_packer_dct.cpp / signal_packer_hadamard.cpp — byte-identical
compressed output and reconstruction (tests/test_tpu_packers.py).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hzr import jax_coder
from ..hzr import pyref as hzr_py
from ..ops import jax_ops as jops
from ..ops import numpy_ops as nops
from . import container
from .host import PackerConfig, _means_header, _means_from_header

log = logging.getLogger(__name__)

try:
    from ..native import bindings as native
    _HAVE_NATIVE = True
except Exception:  # pragma: no cover
    _HAVE_NATIVE = False


def _decode_planes(comp, nr_planes, plane_len):
    """Entropy-decode the per-plane streams (host, native if built)."""
    src = memoryview(bytes(comp) if isinstance(comp, np.ndarray) else comp)
    method = src[0]
    return method, src


class _TpuPackerBase:
    def __init__(self, bytes_per_sample: int, nr_channels: int,
                 nr_samples: int, encoder=None):
        self.cfg = PackerConfig(bytes_per_sample, nr_channels, nr_samples)
        # encoder: object with .encode_blocks(blocks, lengths) — defaults
        # to single-device jax_coder; pass parallel.mesh.ShardedHzrEncoder
        # for a multi-chip mesh.
        self._encoder = encoder

    # -- batched per-plane hzr encode: one device call for all planes --
    def _encode_planes(self, planes_dev) -> list:
        """planes_dev: (nr_planes, plane_len) uint8 on device.
        Returns list of per-plane hzr streams (bytes)."""
        nplanes, plane_len = planes_dev.shape
        B = jax_coder.B
        nb_per = max(1, -(-plane_len // B))
        pad_len = nb_per * B
        padded = jnp.zeros((nplanes, pad_len), jnp.uint8)
        padded = padded.at[:, :plane_len].set(planes_dev)
        blocks = padded.reshape(nplanes * nb_per, B)
        lengths = np.full(nplanes * nb_per, B, np.int32)
        if plane_len % B:
            lengths[nb_per - 1::nb_per] = plane_len % B

        blocks_np = np.asarray(blocks)  # host copy for FILL/COPY payloads
        if self._encoder is not None:
            packed, total_bits, is_fill = self._encoder.encode_blocks(
                blocks_np, lengths)
        else:
            packed, total_bits, is_fill = jax_coder.encode_blocks_device(
                blocks_np, lengths)
        streams = []
        for k in range(nplanes):
            s = slice(k * nb_per, (k + 1) * nb_per)
            streams.append(jax_coder.assemble(
                blocks_np[s], lengths[s], packed[s], total_bits[s],
                is_fill[s]))
        return streams

    def _container_from_planes(self, planes_dev, method: int,
                               header: bytes = b"") -> bytes:
        streams = self._encode_planes(planes_dev)
        parts = [bytes([method]), header]
        for s in streams:
            parts.append(len(s).to_bytes(4, "little"))
            parts.append(s)
        return b"".join(parts)

    def _decode_container(self, comp, nr_planes: int, header_size: int
                          ) -> Tuple[int, bytes, jnp.ndarray, int]:
        """Host entropy decode (native C++ when built) → device planes
        merged to int32."""
        decode_plane = native.hzr_decode if _HAVE_NATIVE else hzr_py.decode
        method, header, merged, consumed = container.decompress_i32(
            comp, nr_planes, self.cfg.plane_len, header_size, decode_plane)
        return method, header, jnp.asarray(merged), consumed


class TpuHzrPacker(_TpuPackerBase):
    """Lossless 4-plane packer (signal_packer_hzr.cpp:39-65)."""

    NR_PLANES = 4
    METHOD = 0

    def compress(self, src) -> bytes:
        c = self.cfg
        raw = jnp.asarray(np.frombuffer(memoryview(src).cast("B"), np.uint8)
                          if not isinstance(src, np.ndarray) else src)
        enc = jops.native_to_i32(raw, c.nr_samples, c.nr_channels,
                                 c.bytes_per_sample)
        planes = jops.plane_split(enc.reshape(-1), self.NR_PLANES)
        return self._container_from_planes(planes, self.METHOD)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, 0)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        out = jops.i32_to_native(merged.reshape(c.nr_channels, c.nr_samples),
                                 c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


class TpuXdeltaHzrPacker(_TpuPackerBase):
    """Lossless delta→offset→xor packer with verify-and-grow
    (signal_packer_xdelta_hzr.cpp:34-88)."""

    METHOD = 0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 nr_bytes_to_encode: int, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.nr_planes = int(nr_bytes_to_encode)

    @staticmethod
    @jax.jit
    def _preprocess(raw, *, _shapes):
        ns, ch, bps = _shapes
        enc = jops.native_to_i32(raw, ns, ch, bps).reshape(-1)
        enc = jops.delta_encode(enc)
        enc = jops.offset32(enc, -128)
        return jops.xor_encode(enc)

    @staticmethod
    @jax.jit
    def _postprocess_flat(merged):
        enc = jops.xor_decode(merged)
        enc = jops.offset32(enc, 128)
        return jops.delta_decode(enc)

    def compress(self, src) -> bytes:
        c = self.cfg
        raw = jnp.asarray(np.frombuffer(memoryview(src).cast("B"), np.uint8)
                          if not isinstance(src, np.ndarray) else src)
        enc = jax.jit(lambda r: jops.xor_encode(jops.offset32(
            jops.delta_encode(jops.native_to_i32(
                r, c.nr_samples, c.nr_channels,
                c.bytes_per_sample).reshape(-1)), -128)))(raw)
        # verify-and-grow (the reference's roundtrip memcmp,
        # signal_packer_xdelta_hzr.cpp:59-71): hzr is lossless, so only
        # plane truncation can lose bits — check on device.
        while True:
            merged = jops.plane_merge(jops.plane_split(enc, self.nr_planes))
            if bool(jnp.array_equal(merged, enc)):
                break
            log.info("xdelta_hzr: growing plane count to %d",
                     self.nr_planes + 1)
            self.nr_planes += 1
        planes = jops.plane_split(enc, self.nr_planes)
        return self._container_from_planes(planes, self.METHOD)

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, _, merged, consumed = self._decode_container(
            comp, self.nr_planes, 0)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        flat = self._postprocess_flat(merged)
        out = jops.i32_to_native(flat.reshape(c.nr_channels, c.nr_samples),
                                 c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


class TpuDctPacker(_TpuPackerBase):
    """Lossy DCT packer (signal_packer_dct.cpp:36-156).

    Transform parity note: the reference accumulates serially in C
    double; its exact value depends on the binary64 rounding of every
    partial sum, which no non-f64 hardware can replicate. Default
    (``device_transform=False``) runs the transform on the host native
    serial kernel — bit-identical reconstruction. ``device_transform=
    True`` uses the df32 MXU/VPU kernels (jax_ops.dct_*_exact): forward
    has a 128× truncation margin (no observed deviations), inverse can
    differ by ±1 on ~0.3‰ of samples."""

    METHOD = 1
    NR_PLANES = 2
    QUALITY = 128.0

    def __init__(self, bytes_per_sample, nr_channels, nr_samples,
                 device_transform: bool = False, **kw):
        super().__init__(bytes_per_sample, nr_channels, nr_samples, **kw)
        self.device_transform = device_transform
        if not device_transform:
            self._cos = nops.dct_cos_table(nr_samples)
            self._cs = nops.dct_cs(nr_samples)
            self._fwd = native.dct_forward if _HAVE_NATIVE \
                else nops.dct_forward
            self._inv = native.dct_inverse if _HAVE_NATIVE \
                else nops.dct_inverse

    def _dct_fwd(self, enc):
        if self.device_transform:
            return jops.dct_forward_exact(enc, self.QUALITY)
        host = np.asarray(enc)
        return jnp.asarray(np.stack([
            self._fwd(host[j], self._cos, self._cs, self.QUALITY)
            for j in range(host.shape[0])]))

    def _dct_inv(self, dct):
        if self.device_transform:
            return jops.dct_inverse_exact(dct, self.QUALITY)
        host = np.asarray(dct)
        return jnp.asarray(np.stack([
            self._inv(host[j], self._cos, self._cs, self.QUALITY)
            for j in range(host.shape[0])]))

    def compress(self, src) -> bytes:
        c = self.cfg
        raw = jnp.asarray(np.frombuffer(memoryview(src).cast("B"), np.uint8)
                          if not isinstance(src, np.ndarray) else src)
        enc = jops.native_to_i32(raw, c.nr_samples, c.nr_channels,
                                 c.bytes_per_sample)
        hi, lo = jops.sum64_parts(enc)
        means = jops.average32_host(np.asarray(hi), np.asarray(lo),
                                    c.nr_samples)
        enc = enc - jnp.asarray(means)[:, None]
        dct = self._dct_fwd(enc)
        flat = jops.xor_encode(jops.offset32(
            jops.delta_encode(dct.reshape(-1)), -128))
        planes = jops.plane_split(flat, self.NR_PLANES)
        return self._container_from_planes(planes, self.METHOD,
                                           _means_header(means))

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        flat = jops.delta_decode(jops.offset32(jops.xor_decode(merged), 128))
        dct = flat.reshape(c.nr_channels, c.nr_samples)
        rec = self._dct_inv(dct)
        means = _means_from_header(header, c.nr_channels)
        rec = rec + jnp.asarray(means)[:, None]
        out = jops.i32_to_native(rec.astype(jnp.int32), c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


class TpuHadamardPacker(_TpuPackerBase):
    """Lossy FWHT packer (signal_packer_hadamard.cpp:35-107); int32
    butterflies, integer-exact /n quantization. n must be 2^k."""

    METHOD = 2
    NR_PLANES = 3
    QUALITY = 1.0

    def compress(self, src) -> bytes:
        c = self.cfg
        raw = jnp.asarray(np.frombuffer(memoryview(src).cast("B"), np.uint8)
                          if not isinstance(src, np.ndarray) else src)
        enc = jops.native_to_i32(raw, c.nr_samples, c.nr_channels,
                                 c.bytes_per_sample)
        hi, lo = jops.sum64_parts(enc)
        means = jops.average32_host(np.asarray(hi), np.asarray(lo),
                                    c.nr_samples)
        enc = enc - jnp.asarray(means)[:, None]
        had = jops.fwht_normalize_pow2(jops.fwht(enc), c.nr_samples,
                                       self.QUALITY)
        planes = jops.plane_split(had.reshape(-1), self.NR_PLANES)
        return self._container_from_planes(planes, self.METHOD,
                                           _means_header(means))

    def decompress(self, comp) -> Tuple[bytes, int]:
        c = self.cfg
        method, header, merged, consumed = self._decode_container(
            comp, self.NR_PLANES, c.nr_channels * 3)
        if method != self.METHOD:
            raise ValueError("unsupported compression method")
        had = merged.reshape(c.nr_channels, c.nr_samples)
        rec = jops.fwht_normalize2_int(jops.fwht(had), self.QUALITY)
        means = _means_from_header(header, c.nr_channels)
        rec = rec + jnp.asarray(means)[:, None]
        out = jops.i32_to_native(rec.astype(jnp.int32), c.bytes_per_sample)
        return np.asarray(out).tobytes(), consumed


# Factory API mirroring i_signal_packer (signal_packer.h:59-72).

def new_hzr(bps, ch, n, **kw):
    return TpuHzrPacker(bps, ch, n, **kw)


def new_xdelta_hzr(bps, ch, n, nr_bytes_to_encode, **kw):
    return TpuXdeltaHzrPacker(bps, ch, n, nr_bytes_to_encode, **kw)


def new_dct(bps, ch, n, **kw):
    return TpuDctPacker(bps, ch, n, **kw)


def new_hadamard(bps, ch, n, **kw):
    return TpuHadamardPacker(bps, ch, n, **kw)
