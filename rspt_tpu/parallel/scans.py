"""Sharded exact int32 scans — shard_map + ppermute carry exchange.

The reference's delta/xor preprocessing scans run over the whole
flattened signal (utils.cpp:193-236), so on a device mesh the scan
state crosses shard boundaries. These kernels run the local scan on
each shard and exchange one int32 carry per boundary over ICI:

* delta_encode / xor_encode need the *last element of the previous
  shard* — a single ppermute shift.
* delta_decode (prefix sum) and xor_decode (prefix xor) need the
  *running total of all previous shards* — local reduce, exclusive
  all-shift combine, then a broadcast-combined local scan.

All arithmetic is int32 wraparound, matching the host oracles
(rspt_tpu/ops/numpy_ops.py) bit-for-bit. Inputs are (n,) arrays whose
leading axis is sharded over mesh axis ``axis_name``; n must divide
evenly (the packers pad to block multiples anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shift_from_left(x_last, axis_name: str, fill):
    """Each shard receives the previous shard's value (shard 0 gets
    ``fill``) via a single ICI ppermute hop."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    shifted = jax.lax.ppermute(x_last, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, fill, shifted)


def make_sharded_scans(mesh: Mesh, axis_name: str = "blocks"):
    """Returns jitted sharded scan functions bound to ``mesh``."""
    spec = NamedSharding(mesh, P(axis_name))

    def _smap(f):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)))

    @_smap
    def delta_encode(a):
        a = a.astype(jnp.int32)
        prev_carry = _shift_from_left(a[-1], axis_name, jnp.int32(0))
        prev = jnp.concatenate([prev_carry[None], a[:-1]])
        return a - prev

    @_smap
    def xor_encode(a):
        a = a.astype(jnp.int32)
        prev_carry = _shift_from_left(a[-1], axis_name, jnp.int32(0))
        prev = jnp.concatenate([prev_carry[None], a[:-1]])
        return a ^ prev

    @_smap
    def delta_decode(a):
        a = a.astype(jnp.int32)
        local = jnp.cumsum(a)  # int32 wraparound prefix sum
        total = local[-1]
        # exclusive prefix over shards: sum of totals of earlier shards
        idx = jax.lax.axis_index(axis_name)
        totals = jax.lax.all_gather(total, axis_name)
        mask = (jnp.arange(totals.shape[0]) < idx).astype(jnp.int32)
        carry = jnp.sum(totals * mask).astype(jnp.int32)
        return local + carry

    @_smap
    def xor_decode(a):
        a = a.astype(jnp.int32)
        local = jax.lax.associative_scan(jnp.bitwise_xor, a)
        total = local[-1]
        idx = jax.lax.axis_index(axis_name)
        totals = jax.lax.all_gather(total, axis_name)
        mask = jnp.arange(totals.shape[0]) < idx
        carry = jax.lax.reduce(jnp.where(mask, totals, 0), np.int32(0),
                               jnp.bitwise_xor, (0,))
        return local ^ carry

    @_smap
    def offset32(a, val):
        return a.astype(jnp.int32) + val.astype(jnp.int32)

    return {
        "delta_encode": delta_encode,
        "xor_encode": xor_encode,
        "delta_decode": delta_decode,
        "xor_decode": xor_decode,
        "sharding": spec,
    }
