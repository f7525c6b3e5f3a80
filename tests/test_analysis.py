"""Peak detectors + rolling median vs the C++ oracle."""

import numpy as np
import pytest

from rspt_tpu.analysis.peaks import PeakDetector, PeakDetectorOffline
from rspt_tpu.analysis.rolling_median import (RollingWindowMedian,
                                              jax_rolling_median,
                                              rolling_median)


def make_ecg(sr=500, seconds=10):
    t = np.arange(sr * seconds) / sr
    beat = np.sin(2 * np.pi * 1.2 * t) ** 63 * 800  # ~72 bpm spikes
    noise = 20 * np.sin(2 * np.pi * 50 * t) + 10 * np.random.RandomState(
        7).normal(size=t.size)
    return beat + noise + 100


def test_streaming_peak_detector_bit_exact(ref):
    sig = make_ecg()
    pd = PeakDetector(500.0, marker_val=1.0)
    opd = ref.lib.ref_new_peak_detector(500.0, 1.0)
    for v in sig:
        got, _, _ = pd.detect(float(v))
        want = ref.lib.ref_peak_detect(opd, float(v))
        assert got == want


def test_offline_peak_detector_bit_exact(ref):
    import ctypes
    sig = make_ecg(sr=250, seconds=8)
    n = sig.size
    peaks = np.zeros(n)
    filt = np.zeros(n)
    thr = np.zeros(n)
    ref.lib.ref_peak_offline(
        250.0, 1.0,
        sig.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        filt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        thr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    pd = PeakDetectorOffline(250.0, 1.0)
    got_peaks, got_filt, got_thr = pd.detect(sig)
    np.testing.assert_array_equal(got_filt, filt)
    np.testing.assert_array_equal(got_thr, thr)
    np.testing.assert_array_equal(got_peaks, peaks)


def test_rolling_median_bit_exact(ref, rng):
    # reference's own fixture style: fixed values then random fill
    # (rspt_test.cpp:327-395) across odd/even/large windows
    vals = np.concatenate([
        np.array([9, 1, 8, 2, 7, 3, 6, 4, 5, 5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10],
                 np.float64),
        rng.normal(0, 100, 5000)])
    for w in (5, 6, 7, 1500):
        rwm = RollingWindowMedian(w)
        om = ref.lib.ref_new_rwm(w)
        for v in vals:
            assert rwm.insert(float(v)) == ref.lib.ref_rwm_insert(om, float(v))


def test_jax_rolling_median_matches_host(rng):
    pytest.importorskip("jax")
    vals = rng.normal(0, 10, 700).astype(np.float32)
    for w in (5, 6, 64):
        got = np.asarray(jax_rolling_median(vals, w))
        want = rolling_median(vals.astype(np.float64), w).astype(np.float32)
        assert np.allclose(got, want, rtol=1e-5, atol=1e-4)
