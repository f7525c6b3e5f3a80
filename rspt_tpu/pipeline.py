"""Streaming real-time path: ring-buffer ingest → IIR pre-filter →
block packer (BASELINE config 5).

The reference's usage pattern (lib_rspt_test/rspt_test.cpp:114-137):
convert native → filter each channel sample-by-sample with
``filter_opt`` → convert back → pack fixed-size buffers. Here the same
pipeline is a small object graph with explicit state:

  producer thread → IoBuffer (packet ring, io/ring.py)
      → StreamingCodec.push(packet)
          → ContinuousRing staging until one block of samples
          → per-channel IIR filter (native serial kernel, carries
            (xz, yz) across blocks — the reference's in-object history
            made explicit and serializable)
          → TPU xdelta_hzr packer → compressed frames

Every stage's carry state is a plain tuple, so checkpoint/resume is
`get_state()`/`set_state()` — the aux-subsystem gap noted in SURVEY §5.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .filters.streaming import IirFilter
from .io.ring import ContinuousRing


@dataclass
class StreamConfig:
    bytes_per_sample: int
    nr_channels: int
    nr_samples: int          # samples per compressed block
    sampling_rate: float = 2000.0
    nr_bytes_to_encode: int = 3
    filter_coeffs: Optional[Tuple[List[float], List[float]]] = None
    # (n = feedback, d = feedforward), reference naming; None = no filter


class StreamingCodec:
    """Push native interleaved bytes in, get compressed frames out."""

    def __init__(self, cfg: StreamConfig, packer=None):
        self.cfg = cfg
        if packer is None:
            from .packers import new_xdelta_hzr
            packer = new_xdelta_hzr(cfg.bytes_per_sample, cfg.nr_channels,
                                    cfg.nr_samples, cfg.nr_bytes_to_encode,
                                    engine="auto")
        self.packer = packer
        self._ring = ContinuousRing(0, np.uint8)
        self._filters = None
        if cfg.filter_coeffs is not None:
            n, d = cfg.filter_coeffs
            self._filters = [IirFilter(n=n, d=d)
                             for _ in range(cfg.nr_channels)]
        self._warmed = False
        self.frames_out = 0
        self.bytes_in = 0
        self.bytes_out = 0

    @property
    def block_bytes(self) -> int:
        c = self.cfg
        return c.bytes_per_sample * c.nr_channels * c.nr_samples

    # -- state (checkpoint/resume) --
    def get_state(self):
        return {
            "ring": self._ring.data.copy(),
            "filters": [f.get_state() for f in self._filters]
            if self._filters else None,
            "warmed": self._warmed,
            "counters": (self.frames_out, self.bytes_in, self.bytes_out),
        }

    def set_state(self, st):
        self._ring.clear()
        self._ring.push_elements_back(st["ring"])
        if self._filters and st["filters"]:
            for f, s in zip(self._filters, st["filters"]):
                f.set_state(s)
        self._warmed = st["warmed"]
        self.frames_out, self.bytes_in, self.bytes_out = st["counters"]

    def _filter_span(self, native: bytes, nblocks: int = 1) -> bytes:
        """Per-channel filter_opt with warmup on the first sample,
        exactly the reference's pre-filter loop (rspt_test.cpp:120-136).
        All channels run in ONE multithreaded native call over the whole
        span — each channel's serial recurrence is untouched (state
        flows through block boundaries in f64 just as the per-sample
        loop carries it), so the output bits equal the
        block-by-block, channel-by-channel loop."""
        from .ops import numpy_ops as nops
        c = self.cfg
        sig = nops.native_to_i32(native, nblocks * c.nr_samples,
                                 c.nr_channels, c.bytes_per_sample)
        if not self._warmed:
            for j in range(c.nr_channels):
                self._filters[j].init_history_values(
                    float(sig[j][0]), int(c.sampling_rate))
            self._warmed = True
        try:
            from .native import bindings as nb
            p = self._filters[0].p
            xz = np.asarray([f.xz for f in self._filters], np.float64)
            yz = np.asarray([f.yz for f in self._filters], np.float64)
            y = nb.iir_filter_channels(sig.astype(np.float64),
                                       self._filters[0].n,
                                       self._filters[0].d, xz, yz, 1)
            for j, f in enumerate(self._filters):
                f.xz, f.yz = xz[j].tolist(), yz[j].tolist()
            out = y.astype(np.int32)
        except Exception:
            out = np.empty_like(sig)
            for j in range(c.nr_channels):
                out[j] = np.asarray(
                    self._filters[j].process(sig[j].astype(np.float64)),
                    np.float64).astype(np.int32)
        return nops.i32_to_native(out, c.bytes_per_sample)

    def push(self, data) -> List[bytes]:
        """Feed native bytes; returns 0+ compressed frames.

        All complete blocks available after the push are processed as
        ONE span: the IIR pre-filter runs over the concatenated span in
        a single multithreaded call (per-channel serial state flows
        through block boundaries exactly as the reference's per-sample
        loop does), and the frames are compressed in one batched
        compress_many call when the packer provides it."""
        buf = np.frombuffer(memoryview(data).cast("B"), np.uint8) \
            if not isinstance(data, np.ndarray) else data.reshape(-1)
        self.bytes_in += buf.size
        self._ring.push_elements_back(buf)
        nblocks = len(self._ring) // self.block_bytes
        if nblocks == 0:
            return []
        span = self._ring.data[:nblocks * self.block_bytes]
        self._ring.pop_elements_front(nblocks * self.block_bytes)
        frames = self._process_span(span, nblocks)
        for comp in frames:
            self.bytes_out += len(comp)
            self.frames_out += 1
        return frames

    def _process_span(self, span: np.ndarray, nblocks: int) -> List[bytes]:
        c = self.cfg
        if self._try_fused_native(span):
            if self._filters is not None and not self._warmed:
                # warmup needs the first sample of each channel
                from .ops import numpy_ops as nops
                first = nops.native_to_i32(
                    span[:c.nr_channels * c.bytes_per_sample], 1,
                    c.nr_channels, c.bytes_per_sample)
                for j in range(c.nr_channels):
                    self._filters[j].init_history_values(
                        float(first[j, 0]), int(c.sampling_rate))
                self._warmed = True
            from .native import bindings as nb
            if self._filters is not None:
                f0 = self._filters[0]
                n_c, d_c = f0.n, f0.d
                xz = np.asarray([f.xz for f in self._filters], np.float64)
                yz = np.asarray([f.yz for f in self._filters], np.float64)
            else:
                n_c = d_c = xz = yz = None
            frames, planes = nb.stream_filter_pack(
                span, c.nr_samples, nblocks, c.nr_channels,
                c.bytes_per_sample, n_c, d_c, xz, yz, 1,
                self.packer.nr_planes)
            self.packer.nr_planes = planes
            if self._filters is not None:
                for j, f in enumerate(self._filters):
                    f.xz, f.yz = xz[j].tolist(), yz[j].tolist()
            return frames
        if self._filters is not None:
            span = np.frombuffer(self._filter_span(span.tobytes(),
                                                   nblocks), np.uint8)
        blocks = [span[k * self.block_bytes:(k + 1) * self.block_bytes]
                  for k in range(nblocks)]
        if hasattr(self.packer, "compress_many") and nblocks > 1:
            return self.packer.compress_many(blocks)
        return [self.packer.compress(b) for b in blocks]

    def _try_fused_native(self, span) -> bool:
        """The one-call C++ span pipeline applies to the native
        xdelta_hzr packer (byte-identical frames either way)."""
        try:
            from .packers.native import NativeXdeltaHzrPacker
            return isinstance(self.packer, NativeXdeltaHzrPacker)
        except Exception:
            return False

    def flush_stats(self):
        return {"frames": self.frames_out, "bytes_in": self.bytes_in,
                "bytes_out": self.bytes_out,
                "cr": self.bytes_in / self.bytes_out
                if self.bytes_out else None}


class StreamingDecoder:
    """Inverse: compressed frames → native byte stream."""

    def __init__(self, cfg: StreamConfig, packer=None):
        self.cfg = cfg
        if packer is None:
            from .packers import new_xdelta_hzr
            packer = new_xdelta_hzr(cfg.bytes_per_sample, cfg.nr_channels,
                                    cfg.nr_samples, cfg.nr_bytes_to_encode,
                                    engine="auto")
        self.packer = packer

    def push(self, frame: bytes) -> bytes:
        out, _ = self.packer.decompress(frame)
        return out
