"""Real-time streaming: acquisition thread → packet ring → filter →
block compression (BASELINE config 5).

Run: python examples/streaming_pipeline.py
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspt_tpu.filters import design
from rspt_tpu.io.ring import IoBuffer
from rspt_tpu.pipeline import StreamConfig, StreamingCodec, StreamingDecoder


def main():
    sr, ch, block = 2000.0, 3, 2048
    cfg = StreamConfig(bytes_per_sample=3, nr_channels=ch, nr_samples=block,
                       sampling_rate=sr, nr_bytes_to_encode=3)
    # 0.4–200 Hz band-pass pre-filter, as the reference demo uses
    # (rspt_test.cpp:122-127)
    b, a = design.create_filter_iir(design.FilterKind.BUTTERWORTH,
                                    design.FilterType.BAND_PASS, 2, sr,
                                    0.4, 200.0)
    cfg.filter_coeffs = (a, b)

    samples_per_packet = 682
    packet = samples_per_packet * 3 * ch  # whole samples per packet
    ring = IoBuffer(packet, nr_max_packets=16)
    stop = threading.Event()

    def producer():
        t = 0
        rng = np.random.default_rng(0)
        while not stop.is_set():
            buf = ring.get_next_address_to_fill()
            if buf is None:
                time.sleep(0.001)
                continue
            n = samples_per_packet
            i = np.arange(t, t + n)
            sig = (4000 * np.sin(2 * np.pi * 7 * i / sr)[:, None]
                   + rng.normal(0, 50, (n, ch))).astype(np.int32)
            v = sig.astype(np.uint32)
            raw = np.zeros((n, ch, 3), np.uint8)
            for k in range(3):
                raw[..., k] = (v >> np.uint32(8 * k)) & np.uint32(0xFF)
            buf[:] = raw.reshape(-1)
            t += n

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    codec = StreamingCodec(cfg)
    dec = StreamingDecoder(cfg)
    frames = 0
    deadline = time.time() + 2.0
    while time.time() < deadline:
        pkt = ring.get_next_filled_address(timeout=0.1)
        if pkt is None:
            continue
        for frame in codec.push(pkt):
            dec.push(frame)
            frames += 1
    stop.set()
    print(f"streamed {frames} frames; stats: {codec.flush_stats()}")


if __name__ == "__main__":
    main()
