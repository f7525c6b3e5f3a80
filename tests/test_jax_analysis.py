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
