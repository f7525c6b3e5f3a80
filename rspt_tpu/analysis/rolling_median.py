"""Rolling-window median — host reference semantics + TPU batch path.

The reference maintains a multiset + median iterator with O(log w)
updates (lib_rspt/lib_stat/rolling_window_median.h:151-254). Its
observable semantics: after inserting each value, return the median of
the last ≤w values — the middle element for odd counts, the average of
the two middle elements ``(lo + hi) / 2.0`` for even counts
(rolling_window_median.h:247-250); during warm-up the window is the
partial prefix.

Host implementation: sorted list + bisect (O(w) memmove per step, fast
in practice; the iterator dance of the reference is an optimization,
not a semantic). TPU batch path: jax_rolling_median computes all
windows at once via a sort per window block — the data-parallel
re-design of the serial structure.
"""

from __future__ import annotations

import bisect
from typing import List

import numpy as np


class RollingWindowMedian:
    """Drop-in equivalent of rolling_window_median<T>::insert."""

    def __init__(self, size: int):
        self.size = int(size)
        self._sorted: List[float] = []
        self._ring: List[float] = []

    def insert(self, value):
        v = value
        bisect.insort(self._sorted, v)
        self._ring.append(v)
        if len(self._ring) > self.size:
            old = self._ring.pop(0)
            i = bisect.bisect_left(self._sorted, old)
            self._sorted.pop(i)
        s = self._sorted
        m = len(s)
        if m % 2:
            return s[m // 2]
        return (s[m // 2 - 1] + s[m // 2]) / 2.0


def rolling_median(values, window: int) -> np.ndarray:
    """Vectorized-ish host convenience: medians for every prefix step."""
    rm = RollingWindowMedian(window)
    return np.array([rm.insert(float(v)) for v in np.asarray(values).ravel()])


def jax_rolling_median(values, window: int):
    """TPU batch path: all rolling medians in one shot.

    Strategy: build the (T, w) sliding-window matrix (gather), sort each
    row (XLA sort → VPU bitonic), pick the middle element(s). Warm-up
    positions (t < w-1) replicate the reference's partial-window
    semantics by padding with +inf and indexing the reduced count.
    O(T·w·log w) work but fully parallel — the TPU re-design of the
    reference's serial O(T·log w) structure.
    """
    import jax.numpy as jnp

    x = jnp.asarray(values, jnp.float32).reshape(-1)
    T = x.shape[0]
    w = int(window)
    idx = jnp.arange(T)[:, None] - jnp.arange(w - 1, -1, -1)[None, :]
    valid = idx >= 0
    gathered = jnp.where(valid, x[jnp.clip(idx, 0, T - 1)], jnp.inf)
    srt = jnp.sort(gathered, axis=1)
    cnt = jnp.minimum(jnp.arange(T) + 1, w)
    lo = srt[jnp.arange(T), (cnt - 1) // 2]
    hi = srt[jnp.arange(T), cnt // 2]
    return jnp.where(cnt % 2 == 1, lo, (lo + hi) / 2.0)
