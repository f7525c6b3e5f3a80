"""Build the C++ reference (read-only at /root/reference) into a shared
library used ONLY as a test oracle for bit-exactness checks.

Nothing from the reference is copied into this repo; we compile it
out-of-tree into build/ (gitignored) and call it via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

REF = os.environ.get("RSPT_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(HERE, "build")
LIB = os.path.join(BUILD, "librspt_ref.so")

SOURCES_C = [
    "lib_rspt/lib_hzr/hzr_encode.c",
    "lib_rspt/lib_hzr/hzr_decode.c",
    "lib_rspt/lib_hzr/hzr_crc32c.c",
    "lib_rspt/lib_hzr/hzr_crc32c_sse4.c",
    "lib_rspt/lib_fwht/fwht.c",
    "lib_rspt/lib_lz4/lz4.c",
    "lib_rspt/lib_lz4/lz4hc.c",
]
SOURCES_CPP = [
    "lib_rspt/lib_signalpacker/signal_packer_base.cpp",
    "lib_rspt/lib_signalpacker/signal_packer_hzr.cpp",
    "lib_rspt/lib_signalpacker/signal_packer_xdelta_hzr.cpp",
    "lib_rspt/lib_signalpacker/signal_packer_dct.cpp",
    "lib_rspt/lib_signalpacker/signal_packer_hadamard.cpp",
    "lib_rspt/lib_signalpacker/utils.cpp",
    "lib_rspt/lib_filter/iir_filter.cpp",
    "lib_rspt/lib_filter/fir_filter.cpp",
    "lib_rspt/lib_filter/iir_filter_design.cpp",
    "lib_rspt/lib_zaxtensor/ZaxTensor.cpp",
    "lib_rspt/lib_zaxtensor/ZaxJsonParser.cpp",
]

# A thin C shim exposing the C++ factory API with C linkage for ctypes.
SHIM = r"""
#include <cstddef>
#include <vector>
using namespace std;
#include "signal_packer.h"
#include "filter.h"
#include "iir_filter_opt.h"
#include "peak_detector.h"
#include "lib_stat/rolling_window_median.h"
#include <cstring>

extern "C" {

void* ref_new_packer(int kind, size_t bps, size_t ch, size_t n, size_t nbytes)
{
    switch (kind) {
    case 0: return i_signal_packer::new_hzr(bps, ch, n);
    case 1: return i_signal_packer::new_xdelta_hzr(bps, ch, n, nbytes);
    case 2: return i_signal_packer::new_dct(bps, ch, n);
    case 3: return i_signal_packer::new_hadamard(bps, ch, n);
    }
    return 0;
}

void ref_compress(void* p, const unsigned char* src, unsigned char* dst,
                  size_t dst_max_len, size_t* dst_len)
{
    ((i_signal_packer*)p)->compress(src, dst, dst_max_len, *dst_len);
}

int ref_decompress(void* p, const unsigned char* src, size_t* src_len,
                   unsigned char* dst)
{
    return ((i_signal_packer*)p)->decompress(src, *src_len, dst);
}

void* ref_new_iir(const double* n, const double* d, size_t nc)
{ return i_filter::new_iir(n, d, nc); }

void* ref_new_fir(const double* k, size_t ks)
{ return i_filter::new_fir(k, ks); }

double ref_filter(void* f, double x) { return ((i_filter*)f)->filter(x); }
double ref_filter_opt(void* f, double x) { return ((i_filter*)f)->filter_opt(x); }
void ref_init_history(void* f, double x, int n)
{ ((i_filter*)f)->init_history_values(x, n); }

int ref_design_iir(double* n_out, double* d_out, int* n_len,
                   int kind, int type, int order, double fs,
                   double lo, double hi)
{
    vector<double> n, d;
    if (!create_filter_iir(n, d, (filter_kind)kind, (filter_type)type,
                           order, fs, lo, hi))
        return 0;
    *n_len = (int)n.size();
    memcpy(n_out, n.data(), n.size() * sizeof(double));
    memcpy(d_out, d.data(), d.size() * sizeof(double));
    return 1;
}

void* ref_new_peak_detector(double fs, double marker)
{ return new peak_detector(fs, marker); }
double ref_peak_detect(void* pd, double x)
{ return ((peak_detector*)pd)->detect(x); }

void ref_peak_offline(double fs, double marker, double* sig, unsigned int len,
                      double* peaks, double* filt, double* thr)
{
    peak_detector_offline pd(fs, marker);
    pd.detect(sig, len, peaks, filt, thr);
}

void* ref_new_rwm(size_t size) { return new rolling_window_median<double>(size); }
double ref_rwm_insert(void* m, double v)
{ return ((rolling_window_median<double>*)m)->insert(v); }

}

// the reference's dormant alternate plane backend
// (signal_packer_base.cpp:73-76) — exposed as the interop oracle for
// the repo's clean-room LZ4 block codec
#include "lib_lz4/lz4.h"
#include "lib_lz4/lz4hc.h"

extern "C" {
int ref_lz4_compress(const char* src, int n, char* dst, int cap)
{ return LZ4_compress_default(src, dst, n, cap); }
int ref_lz4_compress_hc(const char* src, int n, char* dst, int cap,
                        int level)
{ return LZ4_compress_HC(src, dst, n, cap, level); }
int ref_lz4_decompress(const char* src, int n, char* dst, int cap)
{ return LZ4_decompress_safe(src, dst, n, cap); }
}
"""


def build() -> str:
    if os.path.exists(LIB) and os.path.getmtime(LIB) > os.path.getmtime(__file__):
        return LIB
    os.makedirs(BUILD, exist_ok=True)
    shim_path = os.path.join(BUILD, "ref_shim.cpp")
    with open(shim_path, "w") as f:
        f.write(SHIM)
    objs = []
    for src in SOURCES_C:
        obj = os.path.join(BUILD, os.path.basename(src) + ".o")
        subprocess.check_call(
            ["gcc", "-O2", "-fPIC", "-std=c11", "-DNDEBUG", "-msse4.2",
             "-c", os.path.join(REF, src), "-o", obj])
        objs.append(obj)
    for src in SOURCES_CPP:
        obj = os.path.join(BUILD, os.path.basename(src) + ".o")
        subprocess.check_call(
            ["g++", "-O2", "-fPIC", "-std=gnu++11", "-DNDEBUG",
             "-c", os.path.join(REF, src), "-o", obj])
        objs.append(obj)
    shim_obj = os.path.join(BUILD, "ref_shim.o")
    subprocess.check_call(
        ["g++", "-O2", "-fPIC", "-std=gnu++11", "-DNDEBUG",
         "-I", os.path.join(REF, "lib_rspt"),
         "-include", "vector", "-include", "cstring", "-include", "cstdint",
         "-include", "deque", "-include", "set",
         "-c", shim_path, "-o", shim_obj])
    objs.append(shim_obj)
    subprocess.check_call(["g++", "-shared", "-o", LIB] + objs)
    return LIB


class RefLib:
    """ctypes wrapper over the compiled reference oracle."""

    def __init__(self):
        self.lib = ctypes.CDLL(build())
        L = self.lib
        L.ref_new_packer.restype = ctypes.c_void_p
        L.ref_new_packer.argtypes = [ctypes.c_int] + [ctypes.c_size_t] * 4
        L.ref_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]
        L.ref_decompress.restype = ctypes.c_int
        L.ref_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
        L.ref_new_iir.restype = ctypes.c_void_p
        L.ref_new_fir.restype = ctypes.c_void_p
        L.ref_filter.restype = ctypes.c_double
        L.ref_filter.argtypes = [ctypes.c_void_p, ctypes.c_double]
        L.ref_filter_opt.restype = ctypes.c_double
        L.ref_filter_opt.argtypes = [ctypes.c_void_p, ctypes.c_double]
        L.ref_init_history.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                       ctypes.c_int]
        L.ref_design_iir.restype = ctypes.c_int
        L.ref_design_iir.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double]
        L.ref_new_iir.argtypes = [ctypes.POINTER(ctypes.c_double),
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_size_t]
        L.ref_new_fir.argtypes = [ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_size_t]
        L.ref_new_peak_detector.restype = ctypes.c_void_p
        L.ref_new_peak_detector.argtypes = [ctypes.c_double, ctypes.c_double]
        L.ref_peak_detect.restype = ctypes.c_double
        L.ref_peak_detect.argtypes = [ctypes.c_void_p, ctypes.c_double]
        dp = ctypes.POINTER(ctypes.c_double)
        L.ref_peak_offline.argtypes = [ctypes.c_double, ctypes.c_double,
                                       dp, ctypes.c_uint, dp, dp, dp]
        L.ref_new_rwm.restype = ctypes.c_void_p
        L.ref_new_rwm.argtypes = [ctypes.c_size_t]
        L.ref_rwm_insert.restype = ctypes.c_double
        L.ref_rwm_insert.argtypes = [ctypes.c_void_p, ctypes.c_double]

    KINDS = {"hzr": 0, "xdelta_hzr": 1, "dct": 2, "hadamard": 3}

    def lz4_compress(self, src: bytes, hc: int = 0) -> bytes:
        cap = len(src) + len(src) // 255 + 64
        dst = ctypes.create_string_buffer(cap)
        if hc:
            n = self.lib.ref_lz4_compress_hc(src, len(src), dst, cap, hc)
        else:
            n = self.lib.ref_lz4_compress(src, len(src), dst, cap)
        if n <= 0:
            raise RuntimeError("ref lz4 compress failed")
        return dst.raw[:n]

    def lz4_decompress(self, comp: bytes, out_size: int) -> bytes:
        dst = ctypes.create_string_buffer(max(out_size, 1))
        n = self.lib.ref_lz4_decompress(comp, len(comp), dst, out_size)
        if n < 0:
            raise RuntimeError("ref lz4 decompress failed")
        return dst.raw[:n]

    def compress(self, kind: str, src: bytes, bps: int, ch: int, n: int,
                 nbytes: int = 3):
        p = self.lib.ref_new_packer(self.KINDS[kind], bps, ch, n, nbytes)
        dst_max = max(len(src) * 2 + 65536, 1 << 16)
        dst = ctypes.create_string_buffer(dst_max)
        dst_len = ctypes.c_size_t(0)
        self.lib.ref_compress(p, src, dst, dst_max, ctypes.byref(dst_len))
        return dst.raw[:dst_len.value]

    def decompress(self, kind: str, comp: bytes, out_size: int, bps: int,
                   ch: int, n: int, nbytes: int = 3):
        p = self.lib.ref_new_packer(self.KINDS[kind], bps, ch, n, nbytes)
        dst = ctypes.create_string_buffer(out_size)
        src_len = ctypes.c_size_t(0)
        rc = self.lib.ref_decompress(p, comp, ctypes.byref(src_len), dst)
        return rc, dst.raw, src_len.value

    def roundtrip(self, kind: str, src: bytes, bps: int, ch: int, n: int,
                  nbytes: int = 3):
        """Compress then decompress with the SAME instance (the xdelta
        packer mutates its plane count on verify failure, so decompress
        must see the grown state — signal_packer_xdelta_hzr.cpp:59-71)."""
        p = self.lib.ref_new_packer(self.KINDS[kind], bps, ch, n, nbytes)
        dst_max = max(len(src) * 2 + 65536, 1 << 16)
        dst = ctypes.create_string_buffer(dst_max)
        dst_len = ctypes.c_size_t(0)
        self.lib.ref_compress(p, src, dst, dst_max, ctypes.byref(dst_len))
        comp = dst.raw[:dst_len.value]
        out = ctypes.create_string_buffer(len(src))
        src_len = ctypes.c_size_t(0)
        rc = self.lib.ref_decompress(p, comp, ctypes.byref(src_len), out)
        return comp, rc, out.raw, src_len.value

    def design_iir(self, kind: int, type_: int, order: int, fs: float,
                   lo: float, hi: float):
        n = (ctypes.c_double * 16)()
        d = (ctypes.c_double * 16)()
        ln = ctypes.c_int(0)
        ok = self.lib.ref_design_iir(n, d, ctypes.byref(ln), kind, type_,
                                     order, fs, lo, hi)
        if not ok:
            return None
        return list(n[:ln.value]), list(d[:ln.value])


_REF = None


def get_ref() -> RefLib:
    global _REF
    if _REF is None:
        _REF = RefLib()
    return _REF


if __name__ == "__main__":
    print(build())
