"""Batched TPU peak detection — the detector chain as JAX kernels.

The host detectors (analysis/peaks.py) are the bit-exact reference
mirrors; this module is the throughput path: many channels/records at
once, filters as batched IIR (filters/jax_filters), the amplitude-gated
state machine as a lax.scan over time (sequential in T, parallel over
the batch). f32 arithmetic — peak *positions* match the host detector
on real-scale signals, values can differ in low-order bits.

Chain (peak_detector.h:89-93): bandpass → square → LP integrate →
LP threshold → gate (:95-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..filters.design import FilterKind, FilterType, create_filter_iir
from ..filters.jax_filters import iir_apply


def _coeffs(sr: float, order2: bool = True):
    bp = create_filter_iir(FilterKind.BUTTERWORTH, FilterType.BAND_PASS,
                           2 if order2 else 1, sr, 10.0, 20.0)
    integ = create_filter_iir(FilterKind.BUTTERWORTH, FilterType.LOW_PASS,
                              2 if order2 else 1, sr, 3.0)
    thr = create_filter_iir(FilterKind.BUTTERWORTH, FilterType.LOW_PASS,
                            2, sr, 0.15)
    return bp, integ, thr


def detect_batch(x, sampling_rate: float, marker_val: float = 1.0,
                 order2: bool = True):
    """x: (..., T) → (peaks, sig, threshold), each (..., T).

    Filter warmup matches the reference's first-sample
    init_history_values on the bandpass stage (peak_detector.h:86-88),
    done in closed form (O(log iters) affine powers).
    """
    (bp_b, bp_a), (in_b, in_a), (th_b, th_a) = _coeffs(sampling_rate, order2)
    sr = float(sampling_rate)
    x = jnp.asarray(x, jnp.float32)

    from ..filters.jax_filters import iir_warmup_state
    zi = iir_warmup_state(x[..., 0], bp_a, bp_b, 4 * int(sr))
    v, _ = iir_apply(x, bp_a, bp_b, zi=zi, mode="assoc")
    sig, _ = iir_apply(v * v, in_a, in_b, mode="assoc")
    thr, _ = iir_apply(sig, th_a, th_b, mode="assoc")

    nr_slope = int((100.0 * sr) / 1000.0)
    atten = np.float32(1.0 / (1.0 + 25.0 / sr))
    ratio = np.float32(1.5)
    ref_ratio = np.float32(0.5)
    marker = np.float32(marker_val)

    def gate(carry, inp):
        prev_amp, prev_sig, searching, count = carry
        s, t = inp
        confirm = searching & (s > t * ratio) & (prev_sig > s)
        accept = confirm & ((prev_amp == 0) | (prev_sig > prev_amp * ref_ratio))
        attenuate = confirm & ~accept
        rising = (~confirm) & (prev_sig < s)

        prev_amp = jnp.where(accept, prev_sig,
                             jnp.where(attenuate, prev_amp * atten, prev_amp))
        count = jnp.where(accept, 1, jnp.where(rising, 0, count))
        searching = jnp.where(accept, False,
                              jnp.where(rising, True, searching))
        count = jnp.where(count > 0, count + 1, count)
        fire = count == nr_slope
        count = jnp.where(fire, 0, count)
        out = jnp.where(fire,
                        jnp.where(marker == -1.0, s, marker),
                        jnp.float32(0))
        return (prev_amp, s, searching, count), out

    lead = x.shape[:-1]
    carry0 = (jnp.zeros(lead, jnp.float32), jnp.zeros(lead, jnp.float32),
              jnp.zeros(lead, bool), jnp.zeros(lead, jnp.int32))
    sT = jnp.moveaxis(sig, -1, 0)
    tT = jnp.moveaxis(thr, -1, 0)
    _, peaksT = jax.lax.scan(gate, carry0, (sT, tT))
    return jnp.moveaxis(peaksT, 0, -1), sig, thr


def _gate_scan(sig, thr, sampling_rate, marker_val, attenuation):
    """The amplitude-gated state machine (peak_detector.h:95-122) as a
    lax.scan over time, batched over leading dims."""
    sr = float(sampling_rate)
    nr_slope = int((100.0 * sr) / 1000.0)
    atten = np.float32(1.0 / (1.0 + attenuation / sr))
    ratio = np.float32(1.5)
    ref_ratio = np.float32(0.5)
    marker = np.float32(marker_val)

    def gate(carry, inp):
        prev_amp, prev_sig, searching, count = carry
        s, t = inp
        confirm = searching & (s > t * ratio) & (prev_sig > s)
        accept = confirm & ((prev_amp == 0)
                            | (prev_sig > prev_amp * ref_ratio))
        attenuate = confirm & ~accept
        rising = (~confirm) & (prev_sig < s)
        prev_amp = jnp.where(
            accept, prev_sig,
            jnp.where(attenuate, prev_amp * atten, prev_amp))
        count = jnp.where(accept, 1, jnp.where(rising, 0, count))
        searching = jnp.where(accept, False,
                              jnp.where(rising, True, searching))
        count = jnp.where(count > 0, count + 1, count)
        fire = count == nr_slope
        count = jnp.where(fire, 0, count)
        out = jnp.where(fire,
                        jnp.where(marker == -1.0, s, marker),
                        jnp.float32(0))
        return (prev_amp, s, searching, count), out

    lead = sig.shape[:-1]
    carry0 = (jnp.zeros(lead, jnp.float32), jnp.zeros(lead, jnp.float32),
              jnp.zeros(lead, bool), jnp.zeros(lead, jnp.int32))
    _, peaksT = jax.lax.scan(
        gate, carry0, (jnp.moveaxis(sig, -1, 0),
                       jnp.moveaxis(thr, -1, 0)))
    return jnp.moveaxis(peaksT, 0, -1), nr_slope


def detect_offline_batch(x, sampling_rate: float, marker_val: float = 1.0,
                         return_indexes: bool = False):
    """Batched zero-phase offline detector (peak_detector.h:307-403):
    the device runs the heavy O(T) work — the forward+backward filter
    chains (with the reference's quirks: the backward bandpass pass
    re-filters the ORIGINAL signal, and every filter's state carries
    from its forward into its backward pass), the gate scan, and the
    marker move-back — while the final ±10 ms extremum relocation (a
    sparse, sequentially-mutating loop over a handful of markers) runs
    on the host exactly as the oracle does it.

    x: (..., T) → (peaks, filt, thr[, indexes per batch row]).
    """
    from ..filters.jax_filters import iir_warmup_state

    sr = float(sampling_rate)
    x = jnp.asarray(x, jnp.float32)
    lead = x.shape[:-1]
    T = x.shape[-1]

    bp_b, bp_a = create_filter_iir(FilterKind.BUTTERWORTH,
                                   FilterType.BAND_PASS, 1, sr, 15.0, 25.0)
    in_b, in_a = create_filter_iir(FilterKind.BUTTERWORTH,
                                   FilterType.LOW_PASS, 1, sr, 3.0)
    bl_b, bl_a = create_filter_iir(FilterKind.BUTTERWORTH,
                                   FilterType.LOW_PASS, 1, sr, 0.5)
    th_b, th_a = create_filter_iir(FilterKind.BUTTERWORTH,
                                   FilterType.LOW_PASS, 2, sr, 0.15)

    def fwd_bwd(sig, b, a, zi):
        fwd, zf = iir_apply(sig, a, b, zi=zi, mode="assoc")
        bwd, _ = iir_apply(jnp.flip(fwd, -1), a, b, zi=zf, mode="assoc")
        return jnp.flip(bwd, -1)

    x0 = x[..., 0]
    zi_bp = iir_warmup_state(x0, bp_a, bp_b, 4 * int(sr))
    zi_bl = iir_warmup_state(x0, bl_a, bl_b, 4 * int(sr))

    baseline = fwd_bwd(x, bl_b, bl_a, zi_bl)
    # quirk (:319-320): the backward bandpass pass filters the ORIGINAL
    # signal; the forward result only contributes filter state
    _, zf_bp = iir_apply(x, bp_a, bp_b, zi=zi_bp, mode="assoc")
    filt, _ = iir_apply(jnp.flip(x, -1), bp_a, bp_b, zi=zf_bp,
                        mode="assoc")
    filt = jnp.flip(filt, -1)
    filt = fwd_bwd(filt * filt, in_b, in_a, None)
    # threshold: forward pass contributes state only, backward result
    # (of filt reversed) is what's used — matching the oracle's
    # process(filt); process(filt[::-1])[::-1] sequence
    # the 0.15 Hz threshold filter's poles sit ~1e-3 from the unit
    # circle: the associative-scan matrix products drift badly in f32,
    # so this one stage runs the sequential recurrence (mode="scan")
    _, zf_th = iir_apply(filt, th_a, th_b, mode="scan")
    thr, _ = iir_apply(jnp.flip(filt, -1), th_a, th_b, zi=zf_th,
                       mode="scan")
    thr = jnp.flip(thr, -1)

    peaks, nr_slope = _gate_scan(filt, thr, sr, marker_val, 70.0)
    # move markers back to the peak position (:396-403): markers at
    # i >= nr_slope shift to i-nr_slope+1; earlier markers stay put
    tix = jnp.arange(T)
    shifted = jnp.concatenate(
        [peaks[..., nr_slope - 1:],
         jnp.zeros(lead + (nr_slope - 1,), jnp.float32)], axis=-1)
    shifted = jnp.where(tix >= 1, shifted, 0.0)
    kept = jnp.where(tix < nr_slope, peaks, 0.0)
    moved = jnp.where(shifted > 0, shifted, kept)

    # host: exact sequential ±10 ms extremum relocation (:370-395)
    radius = int((10.0 * sr) / 1000.0)
    peaks_np = np.array(moved).reshape(-1, T)
    ecg_np = np.asarray(x, np.float64).reshape(-1, T)
    base_np = np.asarray(baseline, np.float64).reshape(-1, T)
    for b in range(peaks_np.shape[0]):
        pk = peaks_np[b]
        for i in range(radius, T - radius):
            if pk[i]:
                seg = ecg_np[b, i - radius:i + radius] \
                    - base_np[b, i - radius:i + radius]
                mx, mn = int(np.argmax(seg)), int(np.argmin(seg))
                val = pk[i]
                pk[i] = 0
                pk[i - radius + (mx if seg[mx] > -seg[mn] else mn)] = val
    out_peaks = peaks_np.reshape(lead + (T,))
    if return_indexes:
        idx = [np.flatnonzero(row).astype(np.uint32)
               for row in peaks_np]
        return out_peaks, filt, thr, idx
    return out_peaks, filt, thr
