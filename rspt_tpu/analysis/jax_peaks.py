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
