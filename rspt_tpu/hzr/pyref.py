"""Bit-exact hzr codec — pure Python/numpy spec implementation.

This module is the readable, authoritative model of the hzr byte format
(see rspt_tpu/formats/hzr_constants.py for the layout). It produces byte
streams identical to the C++ reference (lib_rspt/lib_hzr/hzr_encode.c,
hzr_decode.c) and is the oracle that the native C++ runtime and the
JAX/TPU two-pass encoder are tested against.

Algorithmic shape (deliberately array-parallel, unlike the reference's
bit-serial loops):
  encode:  tokenize (vectorized zero-run detection) → histogram →
           greedy Huffman tree with the reference's exact tie-breaking
           (hzr_encode.c:247-271: scan order, `<=` makes later index win)
           → preorder tree serialization → per-token (value, nbits) →
           exclusive bit-offset prefix sum → disjoint-bit scatter-OR pack.
  decode:  sequential per block (tree walk with an 8-bit LUT), numpy-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..formats.crc32c import crc32c
from ..formats.hzr_constants import (
    BLOCK_HEADER_SIZE,
    ENCODING_COPY,
    ENCODING_FILL,
    ENCODING_HUFF_RLE,
    HEADER_SIZE,
    MAX_BLOCK_SIZE,
    MAX_TREE_NODES,
    MAX_ZERO_RUN,
    NUM_SYMBOLS,
    SYMBOL_SIZE,
    max_compressed_size,
)


# ---------------------------------------------------------------------------
# Tokenization (vectorized)
# ---------------------------------------------------------------------------

def tokenize_block(block: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a block of bytes into (symbol, extra_value, extra_bits) tokens.

    Zero runs are greedy and capped at MAX_ZERO_RUN (16662); runs never
    cross block boundaries (reference: hzr_encode.c:415-447, the
    histogram pass :143-172 uses identical rules).
    Returns int32 arrays (symbols, extra_vals, extra_bits).
    """
    x = np.asarray(block, dtype=np.uint8)
    n = x.size
    if n == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy(), z.copy()

    iszero = x == 0
    # Boundaries of zero runs.
    prev = np.concatenate(([False], iszero[:-1]))
    run_starts = np.flatnonzero(iszero & ~prev)
    nxt = np.concatenate((iszero[1:], [False]))
    run_ends = np.flatnonzero(iszero & ~nxt)  # inclusive
    run_lens = run_ends - run_starts + 1

    # Split runs longer than the cap into ceil(len/cap) tokens.
    n_tok_per_run = (run_lens + (MAX_ZERO_RUN - 1)) // MAX_ZERO_RUN
    total_run_tokens = int(n_tok_per_run.sum())

    # Expand runs into token (position, length) pairs.
    if total_run_tokens == run_starts.size:
        tok_pos = run_starts
        tok_len = run_lens
    else:
        rep = np.repeat(np.arange(run_starts.size), n_tok_per_run)
        # index of this token within its run
        first = np.concatenate(([0], np.cumsum(n_tok_per_run)[:-1]))
        within = np.arange(total_run_tokens) - first[rep]
        tok_pos = run_starts[rep] + within * MAX_ZERO_RUN
        tok_len = np.minimum(run_lens[rep] - within * MAX_ZERO_RUN, MAX_ZERO_RUN)

    # Classify run tokens (hzr_internal.h:117-121).
    L = tok_len
    run_sym = np.select(
        [L == 1, L == 2, L <= 6, L <= 22, L <= 278],
        [0, 256, 257, 258, 259],
        default=260,
    ).astype(np.int32)
    run_extra = np.select(
        [L <= 2, L <= 6, L <= 22, L <= 278],
        [0, L - 3, L - 7, L - 23],
        default=L - 279,
    ).astype(np.int32)
    run_extra_bits = np.select(
        [L <= 2, L <= 6, L <= 22, L <= 278],
        [0, 2, 4, 8],
        default=14,
    ).astype(np.int32)

    # Literal (nonzero) tokens.
    lit_pos = np.flatnonzero(~iszero)
    lit_sym = x[lit_pos].astype(np.int32)

    # Merge in stream order.
    pos = np.concatenate((tok_pos, lit_pos))
    order = np.argsort(pos, kind="stable")
    syms = np.concatenate((run_sym, lit_sym))[order]
    extras = np.concatenate((run_extra, np.zeros(lit_pos.size, np.int32)))[order]
    extra_bits = np.concatenate(
        (run_extra_bits, np.zeros(lit_pos.size, np.int32)))[order]
    return syms, extras, extra_bits


def histogram261(syms: np.ndarray) -> np.ndarray:
    """261-bin token histogram (reference: hzr_encode.c:133-173)."""
    return np.bincount(syms, minlength=NUM_SYMBOLS).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman tree — exact replication of the reference's greedy build
# ---------------------------------------------------------------------------

@dataclass
class _Node:
    count: int
    symbol: int  # -1 for branch
    a: Optional["_Node"] = None
    b: Optional["_Node"] = None


def build_tree(hist: np.ndarray):
    """Greedy two-lightest-node Huffman build with the reference's exact
    tie-breaking (hzr_encode.c:222-283).

    The reference scans nodes[0..next_idx) each round; `<=` comparisons
    mean the *latest* scanned node with the minimal count becomes node_1
    and similar for node_2; internal nodes are appended after the leaves
    and participate in later scans.

    Returns (root, single_symbol) where single_symbol indicates the
    degenerate one-leaf tree (stored with bits=1, hzr_encode.c:278-282).
    """
    nodes: List[_Node] = [
        _Node(int(hist[k]), k) for k in range(NUM_SYMBOLS) if hist[k] > 0
    ]
    num_symbols = len(nodes)
    if num_symbols == 0:
        return None, False

    nodes_left = num_symbols
    root = None
    while nodes_left > 1:
        node_1 = None
        node_2 = None
        for nd in nodes:
            if nd.count > 0:
                if node_1 is None or nd.count <= node_1.count:
                    node_2 = node_1
                    node_1 = nd
                elif node_2 is None or nd.count <= node_2.count:
                    node_2 = nd
        root = _Node(node_1.count + node_2.count, -1, node_1, node_2)
        node_1.count = 0
        node_2.count = 0
        nodes.append(root)
        nodes_left -= 1

    if root is not None:
        return root, False
    # Single symbol: no branch; stored as a leaf with bits=1
    return nodes[0], True


def serialize_tree(root: _Node, single_symbol: bool):
    """Preorder tree description bits + per-symbol (code, bits) tables.

    Leaf: bit 1 + 9-bit symbol. Branch: bit 0, then child_a with code
    unchanged, child_b with bit `bits` set (LSB-first code growth)
    (reference: hzr_encode.c:177-219).

    Returns (desc_values, desc_nbits, codes[261], code_bits[261]).
    """
    desc_vals: List[int] = []
    desc_bits: List[int] = []
    codes = np.zeros(NUM_SYMBOLS, dtype=np.uint32)
    code_bits = np.zeros(NUM_SYMBOLS, dtype=np.int32)

    def store(node: _Node, code: int, bits: int):
        if node.symbol >= 0:
            desc_vals.append(1)
            desc_bits.append(1)
            desc_vals.append(node.symbol)
            desc_bits.append(SYMBOL_SIZE)
            codes[node.symbol] = code
            code_bits[node.symbol] = bits
            return
        desc_vals.append(0)
        desc_bits.append(1)
        store(node.a, code, bits + 1)
        store(node.b, code + (1 << bits), bits + 1)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * MAX_TREE_NODES))
    try:
        store(root, 0, 1 if single_symbol else 0)
    finally:
        sys.setrecursionlimit(old)
    return (np.asarray(desc_vals, np.uint64), np.asarray(desc_bits, np.int64),
            codes, code_bits)


# ---------------------------------------------------------------------------
# Bit packing (vectorized, LSB-first)
# ---------------------------------------------------------------------------

def pack_bits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack (value, nbits) fields LSB-first into bytes.

    Equivalent to sequential WriteBits + ForceFlushBitCache
    (hzr_encode.c:94-113,77-90). Values must fit in their bit widths
    and each field must be ≤ 57 bits (tree symbols ≤ 9+1, tokens ≤
    code_bits+14 ≤ 37 in valid streams).

    Fields land at disjoint bit positions, so scatter-ADD == scatter-OR.
    """
    values = values.astype(np.uint64, copy=False)
    nbits = nbits.astype(np.int64, copy=False)
    offsets = np.concatenate(([0], np.cumsum(nbits)[:-1]))
    total_bits = int(nbits.sum())
    nbytes = (total_bits + 7) // 8
    out = np.zeros(nbytes + 8, dtype=np.uint8)

    byte_idx = (offsets >> 3).astype(np.int64)
    shift = (offsets & 7).astype(np.uint64)
    shifted = values << shift  # ≤ 57+7 = 64 bits, no overflow for our fields
    for j in range(8):
        contrib = ((shifted >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
        nz = contrib.nonzero()[0]
        if nz.size:
            np.add.at(out, byte_idx[nz] + j, contrib[nz])
    return out[:nbytes].tobytes()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _only_single_code(hist: np.ndarray) -> bool:
    """True if all tokens fall in one 'code class' — zeros (symbol 0 or
    RLE symbols) count as a single class (reference: hzr_encode.c:285-305)."""
    has_zeros = hist[0] > 0 or hist[256:].sum() > 0
    num_nonzero_codes = int((hist[1:256] > 0).sum())
    return (num_nonzero_codes + (1 if has_zeros else 0)) == 1


def encode_block(block: np.ndarray, capacity: Optional[int] = None) -> bytes:
    """Encode one ≤64KiB block, including its 7-byte header.

    ``capacity`` is the remaining output-buffer space (used only to decide
    the copy-fallback the way the reference's limited block stream does,
    hzr_encode.c:376-382); None means unlimited.
    """
    in_size = block.size
    syms, extras, extra_bits = tokenize_block(block)
    hist = histogram261(syms)

    if _only_single_code(hist):
        # FILL block (hzr_encode.c:341-367)
        fill = int(block[0])
        crc = crc32c(block[:1])
        hdr = (0).to_bytes(2, "little") + crc.to_bytes(4, "little") \
            + bytes([ENCODING_FILL, fill])
        return hdr

    def plain_copy() -> bytes:
        crc = crc32c(block)
        return ((in_size - 1).to_bytes(2, "little") + crc.to_bytes(4, "little")
                + bytes([ENCODING_COPY]) + block.tobytes())

    root, single = build_tree(hist)
    desc_vals, desc_nbits, codes, code_bits = serialize_tree(root, single)

    # Per-token packed field: code (LSB-first) followed by extra bits.
    tok_codes = codes[syms].astype(np.uint64)
    tok_cbits = code_bits[syms].astype(np.int64)
    tok_vals = tok_codes | (extras.astype(np.uint64) << tok_cbits.astype(np.uint64))
    tok_nbits = tok_cbits + extra_bits

    all_vals = np.concatenate((desc_vals, tok_vals))
    all_nbits = np.concatenate((desc_nbits, tok_nbits))
    total_bits = int(all_nbits.sum())
    payload_len = (total_bits + 7) // 8

    # Copy fallback: the reference's block stream is limited to
    # header + in_size bytes (also capped by the master buffer), and a
    # final >= MAX_BLOCK_SIZE check (hzr_encode.c:376-382,462-469).
    limit = in_size
    if capacity is not None:
        limit = min(limit, capacity - BLOCK_HEADER_SIZE)
    if payload_len > limit or payload_len >= MAX_BLOCK_SIZE:
        return plain_copy()

    payload = pack_bits(all_vals, all_nbits)
    crc = crc32c(np.frombuffer(payload, np.uint8))
    hdr = ((payload_len - 1).to_bytes(2, "little") + crc.to_bytes(4, "little")
           + bytes([ENCODING_HUFF_RLE]))
    return hdr + payload


def encode(data, out_capacity: Optional[int] = None) -> bytes:
    """hzr_encode equivalent (reference: hzr_encode.c:499-544)."""
    buf = np.frombuffer(memoryview(data).cast("B"), dtype=np.uint8) \
        if not isinstance(data, np.ndarray) else data.astype(np.uint8, copy=False)
    in_size = buf.size
    parts = [int(in_size).to_bytes(4, "little")]
    written = HEADER_SIZE
    for start in range(0, in_size, MAX_BLOCK_SIZE):
        block = buf[start:start + MAX_BLOCK_SIZE]
        cap = None if out_capacity is None else out_capacity - written
        enc = encode_block(block, cap)
        if cap is not None and len(enc) > cap:
            raise ValueError("hzr: output buffer too small")
        parts.append(enc)
        written += len(enc)
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """LSB-first bit reader (reference: hzr_decode.c:102-186)."""

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: memoryview, start: int, end: int):
        self.buf = buf
        self.pos = start * 8
        self.end = end * 8

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.end:
            raise ValueError("hzr: premature end of input")
        out = 0
        got = 0
        pos = self.pos
        while got < nbits:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits - got)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.pos = pos
        return out

    def byte_pos(self) -> int:
        return (self.pos + 7) >> 3


def _recover_tree(br: _BitReader):
    """Rebuild the tree (hzr_decode.c:263-333). Returns nested tuples:
    leaf = symbol int, branch = (a, b)."""
    count = [0]

    def rec(depth: int):
        count[0] += 1
        if count[0] >= MAX_TREE_NODES:
            raise ValueError("hzr: tree too large")
        if br.read(1):
            return br.read(SYMBOL_SIZE)
        if depth >= 300:
            raise ValueError("hzr: tree too deep")
        a = rec(depth + 1)
        b = rec(depth + 1)
        return (a, b)

    return rec(0)


def decode_block(src: memoryview, start: int, src_end: int, out_size: int
                 ) -> Tuple[bytes, int]:
    """Decode one block; returns (decoded bytes, next offset in src)."""
    if start + BLOCK_HEADER_SIZE > src_end:
        raise ValueError("hzr: truncated block header")
    encoded_size = int.from_bytes(src[start:start + 2], "little") + 1
    # CRC (src[start+2:start+6]) is not checked here — hzr_decode skips it
    # (hzr_decode.c:343); use verify() for CRC checking.
    mode = src[start + 6]
    data_start = start + BLOCK_HEADER_SIZE

    if mode == ENCODING_COPY:
        if encoded_size != out_size:
            raise ValueError("hzr: COPY size mismatch")
        if data_start + out_size > src_end:
            raise ValueError("hzr: truncated COPY block")
        return bytes(src[data_start:data_start + out_size]), data_start + out_size

    if mode == ENCODING_FILL:
        if data_start + 1 > src_end:
            raise ValueError("hzr: truncated FILL block")
        return bytes([src[data_start]]) * out_size, data_start + 1

    if mode != ENCODING_HUFF_RLE:
        raise ValueError("hzr: invalid encoding mode")

    block_end = data_start + encoded_size
    if block_end > src_end:
        raise ValueError("hzr: truncated block")
    br = _BitReader(src, data_start, block_end)
    tree = _recover_tree(br)

    out = bytearray()
    single_leaf = not isinstance(tree, tuple)
    while len(out) < out_size:
        if single_leaf:
            br.read(1)
            sym = tree
        else:
            node = tree
            while isinstance(node, tuple):
                node = node[br.read(1)]
            sym = node
        if sym <= 255:
            out.append(sym)
        elif sym == 256:
            out += b"\0\0"
        elif sym == 257:
            out += b"\0" * (br.read(2) + 3)
        elif sym == 258:
            out += b"\0" * (br.read(4) + 7)
        elif sym == 259:
            out += b"\0" * (br.read(8) + 23)
        elif sym == 260:
            out += b"\0" * (br.read(14) + 279)
        else:
            raise ValueError("hzr: invalid symbol")
    if len(out) != out_size:
        raise ValueError("hzr: output overrun")
    return bytes(out), br.byte_pos()


def decode(data, expected_size: Optional[int] = None) -> bytes:
    """hzr_decode equivalent (reference: hzr_decode.c:626-674)."""
    src = memoryview(bytes(data) if isinstance(data, np.ndarray) else data).cast("B")
    if len(src) < HEADER_SIZE:
        raise ValueError("hzr: input too small")
    out_size = int.from_bytes(src[0:4], "little")
    if expected_size is not None and out_size > expected_size:
        raise ValueError("hzr: insufficient output space")
    pos = HEADER_SIZE
    chunks = []
    left = out_size
    while left > 0:
        blk = min(left, MAX_BLOCK_SIZE)
        chunk, pos = decode_block(src, pos, len(src), blk)
        chunks.append(chunk)
        left -= blk
    return b"".join(chunks)


def decoded_size(data) -> int:
    src = memoryview(bytes(data) if isinstance(data, np.ndarray) else data).cast("B")
    return int.from_bytes(src[0:4], "little")


def verify(data) -> int:
    """hzr_verify equivalent: walk blocks and check CRC32C
    (reference: hzr_decode.c:569-624). Returns decoded size; raises on error."""
    src = memoryview(bytes(data) if isinstance(data, np.ndarray) else data).cast("B")
    if len(src) < HEADER_SIZE:
        raise ValueError("hzr: input too small")
    out_size = int.from_bytes(src[0:4], "little")
    pos = HEADER_SIZE
    left = out_size
    while left > 0:
        blk = min(left, MAX_BLOCK_SIZE)
        if pos + BLOCK_HEADER_SIZE > len(src):
            raise ValueError("hzr: truncated block header")
        encoded_size = int.from_bytes(src[pos:pos + 2], "little") + 1
        expected_crc = int.from_bytes(src[pos + 2:pos + 6], "little")
        mode = src[pos + 6]
        if mode > ENCODING_FILL:
            raise ValueError("hzr: unsupported encoding")
        payload = src[pos + BLOCK_HEADER_SIZE:pos + BLOCK_HEADER_SIZE + encoded_size]
        if crc32c(np.frombuffer(payload, np.uint8)) != expected_crc:
            raise ValueError("hzr: CRC32C mismatch")
        if mode == ENCODING_FILL:
            pos += BLOCK_HEADER_SIZE + 1
        else:
            pos += BLOCK_HEADER_SIZE + encoded_size
        left -= blk
    return out_size
