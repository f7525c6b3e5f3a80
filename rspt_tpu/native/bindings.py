"""ctypes bindings for librspt_native (the host-side native runtime).

The library is built on demand by tools/build_native.py. Everything here
mirrors the Python spec implementations in rspt_tpu/hzr/pyref.py and
rspt_tpu/ops/numpy_ops.py, byte-for-byte, but at native speed (and with
optional plane-level multithreading).
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    lib_path = os.path.join(here, "build", "librspt_native.so")
    if not os.path.exists(lib_path):
        import sys
        sys.path.insert(0, here)
        from tools.build_native import build
        lib_path = build()
    lib = ctypes.CDLL(lib_path)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    sz = ctypes.c_size_t
    szp = ctypes.POINTER(ctypes.c_size_t)

    lib.rn_crc32c.restype = ctypes.c_uint32
    lib.rn_crc32c.argtypes = [c_u8p, sz]
    lib.rn_hzr_max_size.restype = sz
    lib.rn_hzr_max_size.argtypes = [sz]
    lib.rn_hzr_encode.restype = ctypes.c_int
    lib.rn_hzr_encode.argtypes = [c_u8p, sz, c_u8p, sz, szp]
    lib.rn_hzr_decode.restype = ctypes.c_int
    lib.rn_hzr_decode.argtypes = [c_u8p, sz, c_u8p, sz, szp]
    lib.rn_hzr_verify.restype = ctypes.c_int
    lib.rn_hzr_verify.argtypes = [c_u8p, sz, szp]
    for name in ("rn_delta_encode", "rn_xor_encode", "rn_xor_decode"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [c_i32p, sz]
    lib.rn_delta_decode.restype = None
    lib.rn_delta_decode.argtypes = [c_i32p, sz, ctypes.c_int32]
    lib.rn_offset32.restype = None
    lib.rn_offset32.argtypes = [c_i32p, sz, ctypes.c_int32]
    lib.rn_native_to_i32.restype = None
    lib.rn_native_to_i32.argtypes = [c_i32p, c_u8p, sz, sz, sz, ctypes.c_int]
    lib.rn_i32_to_native.restype = None
    lib.rn_i32_to_native.argtypes = [c_u8p, c_i32p, sz, sz, sz, ctypes.c_int]
    lib.rn_plane_split.restype = None
    lib.rn_plane_split.argtypes = [c_i32p, sz, ctypes.c_int, c_u8p]
    lib.rn_plane_merge.restype = None
    lib.rn_plane_merge.argtypes = [c_u8p, sz, ctypes.c_int, c_i32p]
    lib.rn_dct_forward.restype = None
    lib.rn_dct_forward.argtypes = [c_i32p, c_i32p, c_f32p, c_f32p,
                                   ctypes.c_int, ctypes.c_double]
    lib.rn_dct_inverse.restype = None
    lib.rn_dct_inverse.argtypes = [c_i32p, c_i32p, c_f32p, c_f32p,
                                   ctypes.c_int, ctypes.c_double]
    lib.rn_dct_forward_mt.restype = None
    lib.rn_dct_forward_mt.argtypes = [c_i32p, c_i32p, c_f32p, c_f32p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_double, ctypes.c_int]
    lib.rn_dct_inverse_mt.restype = None
    lib.rn_dct_inverse_mt.argtypes = [c_i32p, c_i32p, c_f32p, c_f32p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_double, ctypes.c_int]
    lib.rn_fwht.restype = None
    lib.rn_fwht.argtypes = [c_i32p, c_i32p, ctypes.c_int]
    lib.rn_fwht_normalize.restype = None
    lib.rn_fwht_normalize.argtypes = [c_i32p, ctypes.c_int, ctypes.c_double]
    lib.rn_fwht_normalize2.restype = None
    lib.rn_fwht_normalize2.argtypes = [c_i32p, ctypes.c_int, ctypes.c_double]
    lib.rn_build_tables.restype = ctypes.c_int
    lib.rn_build_tables.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), c_i32p, c_u8p, sz, c_i32p,
        c_u8p, ctypes.c_int]
    lib.rn_declut16_batch.restype = ctypes.c_int
    lib.rn_declut16_batch.argtypes = [
        c_u8p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, c_i32p, c_i32p,
        ctypes.c_int, c_i32p, c_i32p, ctypes.c_int]
    lib.rn_declutnib_batch.restype = ctypes.c_int
    lib.rn_declutnib_batch.argtypes = [
        c_u8p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, c_i32p, c_i32p,
        c_i32p, c_i32p, c_i32p, ctypes.c_int, ctypes.c_int]
    lib.rn_iir_filter_array.restype = None
    lib.rn_iir_filter_array.argtypes = [
        ctypes.POINTER(ctypes.c_double), sz,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.rn_iir_filter_channels.restype = None
    lib.rn_iir_filter_channels.argtypes = [
        ctypes.POINTER(ctypes.c_double), sz, sz,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    lib.rn_stream_filter_pack.restype = ctypes.c_int
    lib.rn_stream_filter_pack.argtypes = [
        c_u8p, sz, sz, sz, sz,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        c_u8p, sz, szp, c_i32p, ctypes.c_int]
    lib.rn_encode_planes_mt.restype = ctypes.c_int
    lib.rn_encode_planes_mt.argtypes = [c_u8p, sz, ctypes.c_int, c_u8p, sz,
                                        szp, ctypes.c_int]
    lib.rn_encode_planes_blocks_mt.restype = ctypes.c_int
    lib.rn_encode_planes_blocks_mt.argtypes = [c_u8p, sz, ctypes.c_int,
                                               c_u8p, sz, szp, ctypes.c_int]
    lib.rn_planes_fit.restype = ctypes.c_int
    lib.rn_planes_fit.argtypes = [c_i32p, sz, ctypes.c_int]
    lib.rn_xdelta_preprocess_mt.restype = ctypes.c_int
    lib.rn_xdelta_preprocess_mt.argtypes = [c_u8p, sz, sz, sz, ctypes.c_int,
                                            c_u8p, ctypes.c_int]
    lib.rn_xdelta_postprocess_mt.restype = ctypes.c_int
    lib.rn_xdelta_postprocess_mt.argtypes = [c_u8p, sz, sz, sz, ctypes.c_int,
                                             c_u8p, c_i32p, ctypes.c_int]
    lib.rn_decode_planes_mt.restype = ctypes.c_int
    lib.rn_decode_planes_mt.argtypes = [c_u8p, sz, ctypes.c_int, sz, c_u8p,
                                        szp, ctypes.c_int]
    lib.rn_hzr_decode_blocks_mt.restype = ctypes.c_int
    lib.rn_hzr_decode_blocks_mt.argtypes = [c_u8p, sz, c_u8p, sz,
                                            ctypes.c_int]
    lib.rn_decode_planes_blocks_mt.restype = ctypes.c_int
    lib.rn_decode_planes_blocks_mt.argtypes = [c_u8p, sz, ctypes.c_int, sz,
                                               c_u8p, szp, ctypes.c_int]
    ll = ctypes.c_longlong
    lib.rspt_lz4_max_compressed.restype = ll
    lib.rspt_lz4_max_compressed.argtypes = [ll]
    lib.rspt_lz4_compress.restype = ll
    lib.rspt_lz4_compress.argtypes = [c_u8p, ll, c_u8p, ll]
    lib.rspt_lz4_compress_hc.restype = ll
    lib.rspt_lz4_compress_hc.argtypes = [c_u8p, ll, c_u8p, ll,
                                         ctypes.c_int]
    lib.rspt_lz4_decompress.restype = ll
    lib.rspt_lz4_decompress.argtypes = [c_u8p, ll, c_u8p, ll]
    _LIB = lib
    return lib


def _u8(a) -> np.ndarray:
    if isinstance(a, np.ndarray):
        return np.ascontiguousarray(a, dtype=np.uint8)
    return np.frombuffer(memoryview(a).cast("B"), dtype=np.uint8)


def _p8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pf32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def crc32c(data) -> int:
    buf = _u8(data)
    return int(_load().rn_crc32c(_p8(buf), buf.size))


def hzr_encode(data) -> bytes:
    lib = _load()
    buf = _u8(data)
    cap = int(lib.rn_hzr_max_size(buf.size))
    out = np.empty(cap, dtype=np.uint8)
    out_len = ctypes.c_size_t(0)
    rc = lib.rn_hzr_encode(_p8(buf), buf.size, _p8(out), cap,
                           ctypes.byref(out_len))
    if rc:
        raise ValueError("hzr encode failed")
    return out[:out_len.value].tobytes()


def hzr_decode(data) -> bytes:
    lib = _load()
    buf = _u8(data)
    if buf.size < 4:
        raise ValueError("hzr: input too small")
    total = int.from_bytes(buf[:4].tobytes(), "little")
    out = np.empty(max(total, 1), dtype=np.uint8)
    rc = lib.rn_hzr_decode(_p8(buf), buf.size, _p8(out), total, None)
    if rc:
        raise ValueError("hzr decode failed")
    return out[:total].tobytes()


def hzr_verify(data) -> int:
    lib = _load()
    buf = _u8(data)
    dec = ctypes.c_size_t(0)
    rc = lib.rn_hzr_verify(_p8(buf), buf.size, ctypes.byref(dec))
    if rc:
        raise ValueError("hzr verify failed")
    return dec.value


def delta_encode(a: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_delta_encode(_p32(out), out.size)
    return out


def delta_decode(a: np.ndarray, min_val: int = 0) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_delta_decode(_p32(out), out.size, min_val)
    return out


def offset32(a: np.ndarray, val: int) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_offset32(_p32(out), out.size, val)
    return out


def xor_encode(a: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_xor_encode(_p32(out), out.size)
    return out


def xor_decode(a: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_xor_decode(_p32(out), out.size)
    return out


def native_to_i32(native, nr_samples, nr_channels, bps,
                  reverse=False) -> np.ndarray:
    buf = _u8(native)
    out = np.empty((nr_channels, nr_samples), dtype=np.int32)
    _load().rn_native_to_i32(_p32(out), _p8(buf), nr_samples, nr_channels,
                             bps, 1 if reverse else 0)
    return out


def i32_to_native(arr: np.ndarray, bps: int, reverse=False) -> bytes:
    a = np.ascontiguousarray(arr, dtype=np.int32)
    ch, n = a.shape
    out = np.empty(n * ch * bps, dtype=np.uint8)
    _load().rn_i32_to_native(_p8(out), _p32(a), n, ch, bps,
                             1 if reverse else 0)
    return out.tobytes()


def plane_split(flat: np.ndarray, planes: int) -> np.ndarray:
    a = np.ascontiguousarray(flat, dtype=np.int32)
    out = np.empty((planes, a.size), dtype=np.uint8)
    _load().rn_plane_split(_p32(a), a.size, planes, _p8(out))
    return out


def plane_merge(planes: np.ndarray) -> np.ndarray:
    p = np.ascontiguousarray(planes, dtype=np.uint8)
    out = np.empty(p.shape[1], dtype=np.int32)
    _load().rn_plane_merge(_p8(p), p.shape[1], p.shape[0], _p32(out))
    return out


def dct_forward(src: np.ndarray, cos_table: np.ndarray, cs: np.ndarray,
                quality: float) -> np.ndarray:
    a = np.ascontiguousarray(src, dtype=np.int32)
    ct = np.ascontiguousarray(cos_table, dtype=np.float32)
    c = np.ascontiguousarray(cs, dtype=np.float32)
    out = np.empty(a.size, dtype=np.int32)
    _load().rn_dct_forward(_p32(a), _p32(out), _pf32(ct), _pf32(c),
                           a.size, quality)
    return out


def dct_inverse(dct: np.ndarray, cos_table: np.ndarray, cs: np.ndarray,
                quality: float) -> np.ndarray:
    a = np.ascontiguousarray(dct, dtype=np.int32)
    ct = np.ascontiguousarray(cos_table, dtype=np.float32)
    c = np.ascontiguousarray(cs, dtype=np.float32)
    out = np.empty(a.size, dtype=np.int32)
    _load().rn_dct_inverse(_p32(a), _p32(out), _pf32(ct), _pf32(c),
                           a.size, quality)
    return out


def dct_forward_mt(src: np.ndarray, cos_table: np.ndarray, cs: np.ndarray,
                   quality: float, nthreads: int = 0) -> np.ndarray:
    """All channels at once, threaded over (channel, output-tile); bit
    identical to per-channel dct_forward (rspt_native.cpp dct_fwd_tile)."""
    a = np.ascontiguousarray(src, dtype=np.int32)
    ch, n = (1, a.size) if a.ndim == 1 else a.shape
    ct = np.ascontiguousarray(cos_table, dtype=np.float32)
    c = np.ascontiguousarray(cs, dtype=np.float32)
    out = np.empty_like(a).reshape(ch, n)
    _load().rn_dct_forward_mt(_p32(a), _p32(out), _pf32(ct), _pf32(c),
                              ch, n, quality, nthreads)
    return out


def dct_inverse_mt(dct: np.ndarray, cos_table_t: np.ndarray, cs: np.ndarray,
                   quality: float, nthreads: int = 0) -> np.ndarray:
    """cos_table_t must be the TRANSPOSED forward table (same values,
    contiguous rows for the tile loop)."""
    a = np.ascontiguousarray(dct, dtype=np.int32)
    ch, n = (1, a.size) if a.ndim == 1 else a.shape
    ct = np.ascontiguousarray(cos_table_t, dtype=np.float32)
    c = np.ascontiguousarray(cs, dtype=np.float32)
    out = np.empty_like(a).reshape(ch, n)
    _load().rn_dct_inverse_mt(_p32(a), _p32(out), _pf32(ct), _pf32(c),
                              ch, n, quality, nthreads)
    return out


def fwht(src: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(src, dtype=np.int32)
    out = np.empty(a.size, dtype=np.int32)
    _load().rn_fwht(_p32(a), _p32(out), a.size)
    return out


def fwht_normalize(a: np.ndarray, n: int, ratio: float) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_fwht_normalize(_p32(out), n, ratio)
    return out


def fwht_normalize2(a: np.ndarray, ratio: float) -> np.ndarray:
    out = np.ascontiguousarray(a, dtype=np.int32).copy()
    _load().rn_fwht_normalize2(_p32(out), out.size, ratio)
    return out


def build_tables(hists: np.ndarray, desc_stride: int, nthreads: int = 0):
    """Batched per-block Huffman table build (reference tie-breaking).

    hists: (nb, 261) uint32. Returns (codes u32 (nb,261),
    cbits i32 (nb,261), desc_bytes u8 (nb,desc_stride),
    desc_bits i32 (nb,), is_fill bool (nb,)).
    """
    lib = _load()
    h = np.ascontiguousarray(hists, dtype=np.uint32)
    nb = h.shape[0]
    codes = np.zeros((nb, 261), np.uint32)
    cbits = np.zeros((nb, 261), np.int32)
    desc_bytes = np.zeros((nb, desc_stride), np.uint8)
    desc_bits = np.zeros(nb, np.int32)
    is_fill = np.zeros(nb, np.uint8)
    rc = lib.rn_build_tables(
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), nb,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _p32(cbits), _p8(desc_bytes), desc_stride, _p32(desc_bits),
        _p8(is_fill), nthreads)
    if rc:
        raise ValueError("table build failed")
    return codes, cbits, desc_bytes, desc_bits, is_fill.astype(bool)


def declut16_batch(payloads, l2_cap: int = 64, nthreads: int = 0):
    """Batched 16-bit-peek decode LUTs (hzr/jax_decoder.build_lut
    format) recovered straight from HUFF payloads in C++ threads.

    payloads: list of uint8 arrays. Returns (l1 (nb, 65536) i32,
    l2 (nb, l2_cap, 256) i32, n_deep (nb,) i32, dbits (nb,) i32).
    Raises ValueError when any block fails (caller falls back to the
    Python builder)."""
    lib = _load()
    nb = len(payloads)
    lens = np.array([p.size for p in payloads], np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    buf = np.concatenate([np.ascontiguousarray(p, np.uint8).reshape(-1)
                          for p in payloads]) if nb else \
        np.zeros(0, np.uint8)
    l1 = np.zeros((nb, 65536), np.int32)
    l2 = np.zeros((nb, l2_cap, 256), np.int32)
    n_deep = np.zeros(nb, np.int32)
    dbits = np.zeros(nb, np.int32)
    rc = lib.rn_declut16_batch(
        _p8(buf), offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nb,
        _p32(l1), _p32(l2), l2_cap, _p32(n_deep), _p32(dbits), nthreads)
    if rc:
        raise ValueError("declut16: block outside the 24-bit envelope")
    return l1, l2, n_deep, dbits


def iir_filter_array(x: np.ndarray, n, d, xz, yz, opt: int):
    """Serial IIR over an array with reference accumulation order;
    returns (y, (xz', yz'))."""
    lib = _load()
    xa = np.ascontiguousarray(x, np.float64)
    p = len(n)
    na = np.asarray(n, np.float64)
    da = np.asarray(d, np.float64)
    xza = np.asarray(list(xz) + [0.0] * (p - len(list(xz))), np.float64)[:p]
    yza = np.asarray(list(yz) + [0.0] * (p - len(list(yz))), np.float64)[:p]
    y = np.empty_like(xa)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rn_iir_filter_array(
        xa.ctypes.data_as(dp), xa.size, na.ctypes.data_as(dp),
        da.ctypes.data_as(dp), p, xza.ctypes.data_as(dp),
        yza.ctypes.data_as(dp), int(opt), y.ctypes.data_as(dp))
    return y, (xza.tolist(), yza.tolist())


def stream_filter_pack(src, ns: int, nframes: int, ch: int, bps: int,
                       n, d, xz, yz, opt: int, nr_planes: int,
                       nthreads: int = 0):
    """Fused streaming span: interleaved native bytes → per-channel IIR
    (f64, state in xz/yz (ch, p) arrays, updated in place; n/d None →
    no filter) → per-frame xdelta_hzr containers with sequential
    verify-and-grow plane counts. Returns (frames, final_planes)."""
    lib = _load()
    buf = np.frombuffer(memoryview(src).cast("B"), np.uint8) \
        if not isinstance(src, np.ndarray) else src.reshape(-1)
    F = ch * ns
    dp = ctypes.POINTER(ctypes.c_double)
    if n is None:
        p = 0
        na = da = np.zeros(1, np.float64)
        xza = yza = np.zeros(1, np.float64)
    else:
        p = len(n)
        na = np.asarray(n, np.float64)
        da = np.asarray(d, np.float64)
        xza = np.ascontiguousarray(xz, np.float64)
        yza = np.ascontiguousarray(yz, np.float64)
        assert xza.shape == (ch, p) and yza.shape == (ch, p)
    stride = 1 + 4 * (4 + int(lib.rn_hzr_max_size(F)))
    out = np.empty(nframes * stride, np.uint8)
    lens = (ctypes.c_size_t * nframes)()
    fplanes = np.zeros(nframes, np.int32)
    rc = lib.rn_stream_filter_pack(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ns, nframes, ch, bps, na.ctypes.data_as(dp),
        da.ctypes.data_as(dp), p, xza.ctypes.data_as(dp),
        yza.ctypes.data_as(dp), int(opt), int(nr_planes),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), stride,
        lens, _p32(fplanes), int(nthreads))
    if rc < 0:
        raise ValueError("stream_filter_pack failed")
    if n is not None:
        xz[...] = xza
        yz[...] = yza
    frames = [out[f * stride:f * stride + lens[f]].tobytes()
              for f in range(nframes)]
    return frames, int(rc)


def iir_filter_channels(x: np.ndarray, n, d, xz: np.ndarray,
                        yz: np.ndarray, opt: int, nthreads: int = 0):
    """All channels of x (ch, n) filtered in one MT call, bit-identical
    per channel to iir_filter_array. xz/yz: (ch, p) state arrays,
    updated in place. Returns y (ch, n) float64."""
    lib = _load()
    xa = np.ascontiguousarray(x, np.float64)
    ch, ns = xa.shape
    p = len(n)
    na = np.asarray(n, np.float64)
    da = np.asarray(d, np.float64)
    xza = np.ascontiguousarray(xz, np.float64)
    yza = np.ascontiguousarray(yz, np.float64)
    assert xza.shape == (ch, p) and yza.shape == (ch, p)
    y = np.empty_like(xa)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rn_iir_filter_channels(
        xa.ctypes.data_as(dp), ch, ns, na.ctypes.data_as(dp),
        da.ctypes.data_as(dp), p, xza.ctypes.data_as(dp),
        yza.ctypes.data_as(dp), int(opt), y.ctypes.data_as(dp),
        int(nthreads))
    xz[...] = xza
    yz[...] = yza
    return y


def encode_planes_mt(planes: np.ndarray, nthreads: int = 0) -> bytes:
    """Encode all byte planes concurrently; returns the concatenated
    per-plane [u32 len][hzr stream] container section."""
    lib = _load()
    p = np.ascontiguousarray(planes, dtype=np.uint8)
    nplanes, plane_len = p.shape
    stride = int(lib.rn_hzr_max_size(plane_len)) + 4
    out = np.empty(nplanes * stride, dtype=np.uint8)
    lens = (ctypes.c_size_t * nplanes)()
    rc = lib.rn_encode_planes_mt(_p8(p), plane_len, nplanes, _p8(out),
                                 stride, lens, nthreads)
    if rc:
        raise ValueError("plane encode failed")
    parts = []
    for k in range(nplanes):
        chunk = out[k * stride: k * stride + 4 + lens[k]]
        parts.append(chunk.tobytes())
    return b"".join(parts)


def hzr_decode_blocks_mt(data, nthreads: int = 0) -> bytes:
    """Block-parallel hzr decode (header hop + per-block threads)."""
    lib = _load()
    buf = _u8(data)
    if buf.size < 4:
        raise ValueError("hzr: input too small")
    total = int.from_bytes(buf[:4].tobytes(), "little")
    out = np.empty(max(total, 1), dtype=np.uint8)
    rc = lib.rn_hzr_decode_blocks_mt(_p8(buf), buf.size, _p8(out), total,
                                     nthreads)
    if rc:
        raise ValueError("hzr decode failed")
    return out[:total].tobytes()


def decode_planes_blocks_mt(src, nplanes: int, plane_len: int,
                            nthreads: int = 0) -> Tuple[np.ndarray, int]:
    """All planes × all blocks decoded in one thread pool."""
    lib = _load()
    buf = _u8(src)
    planes = np.empty((nplanes, plane_len), dtype=np.uint8)
    consumed = ctypes.c_size_t(0)
    rc = lib.rn_decode_planes_blocks_mt(
        _p8(buf), buf.size, nplanes, plane_len, _p8(planes),
        ctypes.byref(consumed), nthreads)
    if rc:
        raise ValueError("plane decode failed")
    return planes, consumed.value


def xdelta_preprocess_mt(native, nr_samples: int, nr_channels: int,
                         bps: int, nr_planes: int,
                         nthreads: int = 0) -> Tuple[np.ndarray, bool]:
    """Fused native-bytes → xdelta byte planes in one MT pass.
    Returns (planes (nr_planes, ch*n) u8, fits)."""
    buf = _u8(native)
    N = nr_samples * nr_channels
    planes = np.empty((nr_planes, N), np.uint8)
    fit = _load().rn_xdelta_preprocess_mt(
        _p8(buf), nr_samples, nr_channels, bps, nr_planes, _p8(planes),
        nthreads)
    return planes, bool(fit)


def xdelta_postprocess_mt(planes: np.ndarray, nr_samples: int,
                          nr_channels: int, bps: int,
                          nthreads: int = 0) -> bytes:
    """Fused xdelta byte planes → interleaved native bytes (MT
    two-level prefix scans)."""
    p = np.ascontiguousarray(planes, np.uint8)
    nr_planes, N = p.shape
    out = np.empty(N * bps, np.uint8)
    tmp = np.empty(N, np.int32)
    rc = _load().rn_xdelta_postprocess_mt(
        _p8(p), nr_samples, nr_channels, bps, nr_planes, _p8(out),
        _p32(tmp), nthreads)
    if rc:
        raise ValueError("postprocess failed")
    return out.tobytes()


def planes_fit(flat: np.ndarray, nr_planes: int) -> bool:
    """True if every int32 sign-extends from nr_planes bytes (the
    xdelta verify-and-grow test, one pass, no plane materialization)."""
    a = np.ascontiguousarray(flat, np.int32)
    return bool(_load().rn_planes_fit(_p32(a), a.size, nr_planes))


def encode_planes_blocks_mt(planes: np.ndarray, nthreads: int = 0) -> bytes:
    """Encode all byte planes with block-level threading; returns the
    concatenated per-plane [u32 len][hzr stream] container section."""
    lib = _load()
    p = np.ascontiguousarray(planes, dtype=np.uint8)
    nplanes, plane_len = p.shape
    stride = int(lib.rn_hzr_max_size(plane_len)) + 4
    out = np.empty(nplanes * stride, dtype=np.uint8)
    lens = (ctypes.c_size_t * nplanes)()
    rc = lib.rn_encode_planes_blocks_mt(_p8(p), plane_len, nplanes, _p8(out),
                                        stride, lens, nthreads)
    if rc:
        raise ValueError("plane encode failed")
    parts = []
    for k in range(nplanes):
        parts.append(out[k * stride: k * stride + 4 + lens[k]].tobytes())
    return b"".join(parts)


def decode_planes_mt(src, nplanes: int, plane_len: int,
                     nthreads: int = 0) -> Tuple[np.ndarray, int]:
    lib = _load()
    buf = _u8(src)
    planes = np.empty((nplanes, plane_len), dtype=np.uint8)
    consumed = ctypes.c_size_t(0)
    rc = lib.rn_decode_planes_mt(_p8(buf), buf.size, nplanes, plane_len,
                                 _p8(planes), ctypes.byref(consumed), nthreads)
    if rc:
        raise ValueError("plane decode failed")
    return planes, consumed.value


def declutnib_batch(payloads, cap_slots: int = 512, nthreads: int = 0):
    """Batched nibble-format decode LUTs (hzr/pallas_decoder.
    build_lut_nib layout) recovered straight from HUFF payload bits in
    C++ threads. Returns (l1 (nb,256) i32, lvls (nb,4,cap,16) i32,
    nslots (nb,4) i32, dbits (nb,) i32, ok (nb,) i32 — ok[i] != 0
    means that block needs the Python fallback / host routing)."""
    lib = _load()
    nb = len(payloads)
    lens = np.array([p.size for p in payloads], np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    buf = np.concatenate([np.ascontiguousarray(p, np.uint8).reshape(-1)
                          for p in payloads]) if nb else \
        np.zeros(0, np.uint8)
    l1 = np.zeros((nb, 256), np.int32)
    lvls = np.zeros((nb, 4, cap_slots, 16), np.int32)
    nslots = np.zeros((nb, 4), np.int32)
    dbits = np.zeros(nb, np.int32)
    ok = np.zeros(nb, np.int32)
    lib.rn_declutnib_batch(
        _p8(buf), offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nb,
        _p32(l1), _p32(lvls), _p32(nslots), _p32(dbits), _p32(ok),
        cap_slots, nthreads)
    return l1, lvls, nslots, dbits, ok


def lz4_compress(data) -> bytes:
    """Clean-room LZ4 block compress (rspt_native.cpp, greedy 5-byte
    hash). Interop-tested against the reference's vendored lz4.c."""
    lib = _load()
    buf = _u8(data)
    cap = int(lib.rspt_lz4_max_compressed(buf.size))
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rspt_lz4_compress(_p8(buf), buf.size, _p8(out), cap)
    if n <= 0:
        raise ValueError("lz4 compress failed")
    return out[:n].tobytes()


def lz4_compress_hc(data, depth: int = 256) -> bytes:
    """Clean-room LZ4HC-class block compress: depth-bounded hash-chain
    search + one-step lazy matching (same public block format — any
    spec decoder reads it). Smaller output than the greedy path at a
    few times the search cost."""
    lib = _load()
    buf = _u8(data)
    cap = int(lib.rspt_lz4_max_compressed(buf.size))
    out = np.empty(cap, dtype=np.uint8)
    n = lib.rspt_lz4_compress_hc(_p8(buf), buf.size, _p8(out), cap,
                                 int(depth))
    if n <= 0:
        raise ValueError("lz4 hc compress failed")
    return out[:n].tobytes()


def lz4_decompress(data, out_len: int) -> bytes:
    """Bounds-checked LZ4 block decompress; raises on malformed input."""
    lib = _load()
    buf = _u8(data)
    out = np.empty(max(out_len, 1), dtype=np.uint8)
    n = lib.rspt_lz4_decompress(_p8(buf), buf.size, _p8(out), out_len)
    if n != out_len:
        raise ValueError(f"lz4 decompress failed (rc={n})")
    return out[:out_len].tobytes()
