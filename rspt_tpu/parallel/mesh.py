"""Device mesh construction + sharded block-codec pipeline.

Data parallelism (SURVEY §2.8): the unit of work is one 64 KiB hzr
block; all blocks of all byte-planes of a packer call are batched into
one (nblocks, 65536) array and sharded over the mesh's ``blocks`` axis.
Huffman code tables are tiny per-block tensors sharded the same way;
nothing is replicated except scalars — the collectives on the hot path
are only the carry exchanges in parallel/scans.py plus the final
all-gather of packed bytes back to the host.

Multi-host: call jax.distributed.initialize() before make_mesh() and
the same code runs over ICI+DCN (jax.devices() spans hosts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hzr import jax_coder

AXIS = "blocks"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def pad_blocks(nb: int, ndev: int) -> int:
    """Blocks padded so the batch divides the mesh."""
    return -(-nb // ndev) * ndev


class ShardedHzrEncoder:
    """hzr encode with the block batch sharded over a mesh.

    Drop-in for jax_coder.encode_blocks_device: the two device passes
    run with inputs/outputs sharded over ``blocks``; the host Huffman
    step sees gathered histograms (nb×261 ints — negligible traffic).
    """

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ndev = self.mesh.devices.size
        self.block_sharding = NamedSharding(self.mesh, P(AXIS))
        self.tok = jax.jit(
            jax_coder.tokenize_blocks.__wrapped__,
            in_shardings=(self.block_sharding, self.block_sharding),
            out_shardings=self.block_sharding)
        self.pack = jax.jit(
            jax_coder.pack_blocks.__wrapped__,
            in_shardings=(self.block_sharding,) * 4
            + (self.block_sharding, self.block_sharding, self.block_sharding),
            out_shardings=self.block_sharding)

    def encode_blocks(self, blocks_np: np.ndarray, lengths_np: np.ndarray):
        nb = blocks_np.shape[0]
        nb_pad = pad_blocks(nb, self.ndev)
        if nb_pad != nb:
            blocks_np = np.concatenate(
                [blocks_np, np.zeros((nb_pad - nb, jax_coder.B), np.uint8)])
            lengths_np = np.concatenate(
                [lengths_np, np.zeros(nb_pad - nb, np.int32)])
        multiproc = jax.process_count() > 1
        if multiproc:
            # Multi-host: each process materializes only the shards its
            # local devices own; host-side gathers of (small) device
            # outputs ride process_allgather over DCN. Assumes the input
            # bytes are host-replicated (each host read the same buffer;
            # production ingest would read per-host shards instead).
            from jax.experimental import multihost_utils as mhu

            def put(arr):
                sh = NamedSharding(self.mesh, P(AXIS, *([None] *
                                                        (arr.ndim - 1))))
                return jax.make_array_from_callback(
                    arr.shape, sh, lambda idx: arr[idx])

            def fetch(a):
                return np.asarray(mhu.process_allgather(a, tiled=True))
        else:
            def put(arr):
                return jax.device_put(arr, self.block_sharding)

            def fetch(a):
                return np.array(a)

        blocks = put(blocks_np)
        lengths = put(lengths_np)
        syms, extras, ebits, tvalid, hist = self.tok(blocks, lengths)
        codes, cbits, desc_bytes, desc_bits, is_fill = \
            jax_coder.host_tables(fetch(hist), lengths_np)

        packed, total_bits = self.pack(
            syms, extras, ebits, tvalid,
            put(codes), put(cbits), put(desc_bits))
        packed = fetch(packed)[:nb].copy()
        packed[:, :desc_bytes.shape[1]] |= desc_bytes[:nb]
        return packed, fetch(total_bits)[:nb], is_fill[:nb]

    def encode(self, data, out_capacity=None) -> bytes:
        buf = np.frombuffer(memoryview(data).cast("B"), dtype=np.uint8) \
            if not isinstance(data, np.ndarray) \
            else data.astype(np.uint8, copy=False)
        blocks_np, lengths_np = jax_coder._split_blocks(buf)
        packed, total_bits, is_fill = self.encode_blocks(blocks_np,
                                                         lengths_np)
        return jax_coder.assemble(blocks_np, lengths_np, packed, total_bits,
                                  is_fill, out_capacity)
