"""Signal-packer container format.

Layout (reference: lib_rspt/lib_signalpacker/signal_packer_base.cpp):
    [method: 1 byte]
    [optional packer header (e.g. per-channel means)]
    per plane k in 0..nr_planes-1:
        [u32le length of hzr stream] [hzr stream]

Plane k holds byte k (LSB first) of every value of the channel-major
int32 workspace, flattened channel-by-channel (base.cpp:40-68).
Each plane is hzr-encoded independently — that independence is what the
TPU data-parallel path exploits (planes × 64KiB blocks = shard grid).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..hzr import pyref as hzr
from ..ops import numpy_ops as nops

_LEN_BYTES = 4  # CHUNK_MAX_SIZE_TYPE = uint32 (base.cpp:36)

# Alternate entropy backends: the reference keeps dormant LZ4/LZ4HC and
# zzip (BWT) calls commented out on this same per-plane boundary
# (signal_packer_base.cpp:26-28,73-76,107-109) — a compile-time swap.
# Here the LZ4 backend is LIVE and self-describing: bit 0x40 of the
# method byte marks LZ4-coded planes, and decompress_i32 dispatches on
# it (the low 6 bits keep the reference's packer-type values 0/1/2, so
# flag-free streams stay byte-identical to the reference format).
# zzip/BWT remains unported (SURVEY §2.4). The reference also declares
# a ``new_lala`` factory that is never defined anywhere
# (signal_packer.h:71, call commented out in rspt_test.cpp:155-157) —
# reproduced here only as this note.

PLANE_LZ4 = 0x40
METHOD_MASK = 0x3F


def plane_codec(use_lz4: bool, plane_len: int, hc: bool = False):
    """(encode_plane, decode_plane) pair for a backend choice.

    hzr streams are self-framing (embedded total + CRC); LZ4 block
    streams are not, so the decoder closure binds the container-known
    plane length. Native LZ4 is preferred; the Python spec codec
    (formats/lz4_block.py) is the fallback. hc=True selects the
    hash-chain/lazy high-compression matcher (the reference's dormant
    lz4hc.c slot) — same block format, so decode is unchanged and
    greedy/HC streams interoperate freely.
    """
    if not use_lz4:
        return hzr.encode, (lambda b: hzr.decode(b))
    try:
        from ..native import bindings as nb
        nb._load()
        enc = nb.lz4_compress_hc if hc else nb.lz4_compress
        return enc, (lambda b: nb.lz4_decompress(b, plane_len))
    except Exception:  # pragma: no cover - native build unavailable
        from ..formats import lz4_block
        return (lz4_block.compress,
                lambda b: lz4_block.decompress(b, plane_len))


def compress_i32(enc: np.ndarray, method: int, nr_planes: int,
                 header: bytes = b"",
                 encode_plane=None) -> bytes:
    """Container-encode a (channels, samples) int32 workspace.

    ``encode_plane`` lets callers swap the plane entropy coder (pyref,
    native, or the JAX two-pass encoder); defaults to the Python spec
    implementation.
    """
    encode_plane = encode_plane or plane_codec(bool(method & PLANE_LZ4), 0)[0]
    flat = enc.reshape(-1)
    planes = nops.plane_split(flat, nr_planes)
    parts = [bytes([method]), header]
    for k in range(nr_planes):
        stream = encode_plane(planes[k])
        parts.append(len(stream).to_bytes(_LEN_BYTES, "little"))
        parts.append(stream)
    return b"".join(parts)


def decompress_i32(src, nr_planes: int, plane_len: int,
                   header_size: int = 0,
                   decode_plane=None) -> Tuple[int, bytes, np.ndarray, int]:
    """Returns (method, header, (N,) int32 merged values, consumed_bytes).

    Mirrors signal_packer_base.cpp:98-139 including per-plane-count sign
    extension on merge.
    """
    src = memoryview(bytes(src) if isinstance(src, np.ndarray) else src).cast("B")
    method = src[0]
    decode_plane = decode_plane or plane_codec(
        bool(method & PLANE_LZ4), plane_len)[1]
    pos = 1
    header = bytes(src[pos:pos + header_size])
    pos += header_size
    planes = np.zeros((nr_planes, plane_len), dtype=np.uint8)
    for k in range(nr_planes):
        comp_len = int.from_bytes(src[pos:pos + _LEN_BYTES], "little")
        pos += _LEN_BYTES
        decoded = decode_plane(src[pos:pos + comp_len])
        planes[k] = np.frombuffer(decoded, np.uint8, count=plane_len)
        pos += comp_len
    merged = nops.plane_merge(planes)
    return method, header, merged, pos
