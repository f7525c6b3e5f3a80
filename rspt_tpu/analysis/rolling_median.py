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


def jax_rolling_median_large(values, window: int, stride: int = 512):
    """Exact rolling median for LARGE windows without materializing the
    (T, w) matrix (the reference's test_8 regime: w=1500 over 1M
    samples would be a 1.5G-element sort problem).

    Anchor decomposition: windows whose start falls in one
    ``stride``-aligned bucket share an anchor window A = x[α:α+w]
    (sorted once) and differ from it by removing a prefix of
    R = x[α:α+s] and appending a prefix of P = x[α+w:α+w+s]. Each
    output's rank-k element is found by a binary search over the
    per-anchor merged sorted candidates M = sort(A ∪ P); the count of
    window elements ≤ M[j] is  Q[j] − #R_d≤v + #P_d≤v  where Q is the
    from-A cumulative count (positional Q under ties stays value-exact:
    the predicate can only flip inside a run of equal values). Work:
    O(T/s · (w+s) log) sorts + O(T log(w+s)) gathered probes +
    O(T·s·log) masked compares — all batched.

    Returns float32 medians for t >= w-1; warm-up prefixes (partial
    windows, rolling_window_median.h:247-250 semantics) come from the
    small-window path on the first w samples.
    """
    import jax.numpy as jnp

    x_np = np.asarray(values, np.float32).reshape(-1)
    T = x_np.size
    w = int(window)
    s = int(stride)
    if T <= w or w <= 2 * s:
        return jax_rolling_median(x_np, w)

    import jax

    nw = T - (w - 1)                     # full windows
    na = -(-nw // s)                     # anchors
    pad = na * s + w + s                 # room for pools
    xp = jnp.asarray(np.concatenate(
        [x_np, np.full(pad - T, np.inf, np.float32)]))

    starts = jnp.arange(na) * s
    gather_w = starts[:, None] + jnp.arange(w + s)[None, :]
    AP = xp[gather_w]                    # (na, w+s): A then P pool
    flags = jnp.concatenate([jnp.ones(w, jnp.int32),
                             jnp.zeros(s, jnp.int32)])
    order = jnp.argsort(AP, axis=1)
    M = jnp.take_along_axis(AP, order, axis=1)
    Q = jnp.cumsum(jnp.take_along_axis(
        jnp.broadcast_to(flags, AP.shape), order, axis=1), axis=1)
    # make Q value-exact under ties (Q[j] must be #A <= M[j] as a
    # VALUE count, or mixing with the value-based delta counts breaks
    # the search's monotonicity): propagate each equal-value run's
    # end Q leftward by doubling — valid because M is sorted, so
    # M[j] == M[j+p] implies the whole gap is equal
    p = 1
    while p < w + s:
        Mp = jnp.concatenate(
            [M[:, p:], jnp.full((na, p), jnp.inf, M.dtype)], axis=1)
        Qp = jnp.concatenate(
            [Q[:, p:], jnp.zeros((na, p), Q.dtype)], axis=1)
        Q = jnp.where(M == Mp, jnp.maximum(Q, Qp), Q)
        p *= 2

    R = AP[:, :s]                        # removal pool (prefix of A)
    P = AP[:, w:w + s]                   # addition pool
    dd = jnp.arange(s, dtype=jnp.int32)[None, :]         # (1, s)
    elem = jnp.arange(s, dtype=jnp.int32)[None, None, :]  # masks

    def count_delta(pool, v):
        # #{pool[:d] <= v} for every (anchor, d): minor-axis reduce
        le = (pool[:, None, :] <= v[:, :, None]) & (elem < dd[:, :, None])
        return jnp.sum(le, axis=2, dtype=jnp.int32)

    def select(k):
        lo = jnp.zeros((na, s), jnp.int32)
        hi = jnp.full((na, s), w + s, jnp.int32)

        def step(_, st):
            lo, hi = st
            mid = (lo + hi) // 2
            v = jnp.take_along_axis(M, mid, axis=1)
            qa = jnp.take_along_axis(Q, mid, axis=1)
            cnt = qa - count_delta(R, v) + count_delta(P, v)
            ge = cnt >= k
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        nsteps = int(np.ceil(np.log2(w + s))) + 1
        lo, hi = jax.lax.fori_loop(0, nsteps, step, (lo, hi))
        return jnp.take_along_axis(M, jnp.minimum(hi, w + s - 1), axis=1)

    if w % 2:
        med = select((w + 1) // 2).reshape(-1)[:nw]
    else:
        v1 = select(w // 2).reshape(-1)[:nw]
        v2 = select(w // 2 + 1).reshape(-1)[:nw]
        med = (v1 + v2) / 2.0
    warm = jax_rolling_median(x_np[:w - 1], w)
    return jnp.concatenate([jnp.asarray(warm, jnp.float32), med])


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
