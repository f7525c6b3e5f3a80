"""Batched TPU analysis kernels vs the host (bit-exact) detectors."""

import numpy as np
import pytest

pytest.importorskip("jax")


def make_ecg(sr=360, seconds=20, channels=3):
    t = np.arange(sr * seconds) / sr
    rng = np.random.RandomState(3)
    beats = np.sin(2 * np.pi * 1.1 * t[None, :]
                   + 0.3 * np.arange(channels)[:, None]) ** 63 * 900
    return beats + 15 * rng.normal(size=(channels, t.size)) + 50


def test_batched_peaks_match_host_positions():
    from rspt_tpu.analysis.jax_peaks import detect_batch
    from rspt_tpu.analysis.peaks import PeakDetector

    sig = make_ecg()
    peaks, _, _ = detect_batch(sig, 360.0)
    peaks = np.asarray(peaks)

    for ch in range(sig.shape[0]):
        pd = PeakDetector(360.0)
        host = np.array([pd.detect(float(v))[0] for v in sig[ch]])
        got_idx = np.flatnonzero(peaks[ch])
        want_idx = np.flatnonzero(host)
        # f32 vs f64 filters: positions must agree within a couple of
        # samples and counts must match on clean signals
        assert len(got_idx) == len(want_idx)
        assert np.all(np.abs(got_idx - want_idx) <= 3)


def test_offline_detector_batch_matches_oracle(rng):
    """Batched zero-phase detector (device filters + gate + move-back,
    host relocation) finds the same peak indexes as the host oracle
    (peak_detector.h:307-403)."""
    from rspt_tpu.analysis.jax_peaks import detect_offline_batch
    from rspt_tpu.analysis.peaks import PeakDetectorOffline

    sr = 1000.0
    t = np.arange(6000) / sr
    ecg = (1200.0 * np.exp(-((t % 0.8) - 0.35) ** 2 / 0.0002)
           + 150 * np.sin(2 * np.pi * 0.4 * t)
           + rng.normal(0, 12.0, t.size))
    batch = np.stack([ecg, ecg * 1.3])
    _, _, _, idxs = detect_offline_batch(batch, sr, return_indexes=True)
    for row, got in zip(batch, idxs):
        want = PeakDetectorOffline(sr).detect(row, return_indexes=True)[3]
        assert np.array_equal(want, got)


def test_rolling_median_large_window_matches_oracle(rng):
    """The anchor-decomposition device median (no (T, w) materialize)
    equals the multiset oracle in the reference's test_8 w=1500 regime,
    including warm-up prefixes, even/odd ranks and heavy duplicates."""
    from rspt_tpu.analysis.rolling_median import (RollingWindowMedian,
                                                  jax_rolling_median_large)

    for w, data in ((1500, rng.integers(0, 1000, 20000)),
                    (1500, rng.integers(0, 6, 12000)),
                    (1501, rng.integers(0, 50, 9000))):
        x = data.astype(np.float64)
        rm = RollingWindowMedian(w)
        want = np.array([rm.insert(float(v)) for v in x], np.float32)
        got = np.asarray(jax_rolling_median_large(x, w))
        assert np.array_equal(got, want), (w, x.size)
