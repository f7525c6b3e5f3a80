"""Encoder-side aligned-decode sidecars.

The Pallas decoder's alignment fixpoint exists only to discover where
symbols start: each segment lane must find "first symbol start >= the
nominal boundary dbits + s*segw*32" before it can decode in lockstep,
and unhinted that discovery costs ~4 speculative sweeps of the whole
kernel. But the ENCODER's flat pack already knows every symbol's exact
bit offset (that is what exact-offset placement means), so it can emit
the converged entries as a sidecar at encode time — a first decode then
runs a single trusted sweep, exactly like a decode replayed with
captured hints (pallas_decoder.DecodeHints).

Mirrors the reference decoder's per-block independence contract
(hzr_encode.c:528-539); the sidecar is an additive artifact — streams
remain byte-identical with or without it, and a decoder that never sees
it (or sees one whose digest mismatches) just runs the fixpoint.

Safety: hints are bound to stream content by the same digest the
decoder computes over the stored per-block CRC32C fields + geometry
(pallas_decoder._hints_digest), so a stale or mismatched sidecar can
only ever cause a fixpoint fallback, never corruption. Any layout or
routing drift between this module and decode_many degrades the same
way — lane_rows() is shared code precisely so it doesn't.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from . import pyref
from .jax_coder import GROUP_TOK_FLAT, _crc32c
from .pallas_decoder import (DecodeHints, _hints_digest, build_lut_nib,
                             lane_rows)

# park area past the real lanes for blocks the decoder routes off
# device: largest parked span is nseg <= ~1032 lanes (9 rows) plus the
# kernel's 16-row placement window; parked blocks may collide there —
# those lanes are never read
PARK_ROWS = 32


class HintPlan:
    """Host half of an encode-time sidecar: the per-group kernel meta
    plus everything finish() needs to assemble the DecodeHints."""

    __slots__ = ("gmeta", "hint_rows", "nrows_l", "init2", "routed",
                 "ooff", "olen", "dbits")

    def __init__(self, gmeta, hint_rows, nrows_l, init2, routed, ooff,
                 olen, dbits):
        self.gmeta = gmeta
        self.hint_rows = hint_rows
        self.nrows_l = nrows_l
        self.init2 = init2
        self.routed = routed
        self.ooff = ooff
        self.olen = olen
        self.dbits = dbits


def plan_hints(lengths_np, comp_len, desc_bits, is_huff, desc_bytes,
               g2b, gfirst, ng: int) -> Optional[HintPlan]:
    """Build the sidecar plan for one flat-pack batch.

    Replicates decode_many's routing decision (tree -> nibble LUT,
    chunk-count cost gate) from the packed tree descriptions the
    encoder just built, then lays out the SAME segment lanes the
    decoder will (pallas_decoder.lane_rows). Returns None when no block
    routes to the device decoder (hints would be dead weight)."""
    nb = len(lengths_np)
    dev_chunks = int(os.environ.get("RSPT_DEC_DEVICE_CHUNKS", "64"))
    routed = np.zeros(nb, bool)
    for i in range(nb):
        if lengths_np[i] == 0 or not is_huff[i]:
            continue
        br = pyref._BitReader(memoryview(desc_bytes[i].tobytes()), 0,
                              desc_bytes.shape[1])
        try:
            tree = pyref._recover_tree(br)
        except Exception:
            return None
        if br.pos != int(desc_bits[i]):
            return None  # layout drift: never emit unsound hints
        lut = build_lut_nib(tree)
        if lut is not None and sum(lut[2]) > dev_chunks:
            lut = None
        routed[i] = lut is not None
    ridx = np.flatnonzero(routed)
    if ridx.size == 0:
        return None

    geom = [(int(comp_len[i]) * 8, int(desc_bits[i])) for i in ridx]
    rows, blk_rows = lane_rows(geom)
    nrows_l = len(rows)
    row_base = {}
    for r, (bi, seg_lo) in enumerate(rows):
        if bi >= 0 and bi not in row_base:
            row_base[bi] = r

    # per-block lane base + segment width (parked blocks share the park
    # area; their own segw keeps the kernel's c-step <= 1 bound)
    lane_base = np.full(nb, nrows_l * 128, np.int64)
    W = np.full(nb, 256, np.int64)
    init2 = np.zeros(nrows_l * 128, np.int32)
    for k, i in enumerate(ridx):
        lane_base[i] = row_base[k] * 128
        segw, nseg, _nrow = blk_rows[k]
        W[i] = segw * 32
        lo = row_base[k] * 128
        init2[lo:lo + nseg] = int(comp_len[i]) * 8  # inactive: >= segend
        init2[lo] = int(desc_bits[i])               # segment 0 is exact
    for i in range(nb):
        if not routed[i] and is_huff[i] and lengths_np[i] > 0:
            body_words = -(-max(int(comp_len[i]) * 8
                                - int(desc_bits[i]), 1) // 32)
            from .pallas_decoder import SEG_PER_BLOCK
            W[i] = max(8, -(-body_words // SEG_PER_BLOCK)) * 32

    gmeta = np.zeros((ng, 4), np.int32)
    gmeta[:, 0] = (np.arange(ng) == np.asarray(gfirst)).astype(np.int32)
    gmeta[:, 1] = W[g2b]
    gmeta[:, 2] = lane_base[g2b] + 1
    gmeta[:, 3] = np.asarray(desc_bits)[g2b]

    hint_rows = nrows_l + PARK_ROWS
    ooff = np.concatenate(([0], np.cumsum(lengths_np)[:-1]))
    return HintPlan(gmeta, hint_rows, nrows_l,
                    init2.reshape(nrows_l, 128), routed, ooff,
                    np.asarray(lengths_np), np.asarray(desc_bits))


def finish_hints(plan: HintPlan, entries_raw, tight: np.ndarray,
                 hoff, comp_len) -> DecodeHints:
    """Assemble the DecodeHints once the kernel entries and the final
    payload bytes (tight, AFTER the tree-description OR-merge — the
    stored CRC fields cover the merged payload) are on the host."""
    raw = np.asarray(entries_raw)[:plan.nrows_l]
    entries = np.where(raw > 0, raw, plan.init2).astype(np.int32)
    parts: List[Tuple[int, int, int, int, int]] = []
    for i in np.flatnonzero(plan.routed):
        cl = int(comp_len[i])
        payload = tight[int(hoff[i]):int(hoff[i]) + cl]
        parts.append((int(_crc32c(payload)), cl, int(plan.dbits[i]),
                      int(plan.ooff[i]), int(plan.olen[i])))
    hints = DecodeHints(_hints_digest(parts), entries)
    # ambient registration: any later decode of these streams — even
    # through an API that never plumbs a hints argument — runs hinted
    # (pallas_decoder validates the first hinted decode per process)
    from . import pallas_decoder
    pallas_decoder.register_hints(hints)
    return hints
