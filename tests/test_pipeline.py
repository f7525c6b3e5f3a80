"""Streaming pipeline: ingest → filter → pack → unpack."""

import numpy as np
import pytest

from rspt_tpu.filters import design
from rspt_tpu.pipeline import StreamConfig, StreamingCodec, StreamingDecoder


@pytest.fixture
def cfg():
    return StreamConfig(bytes_per_sample=3, nr_channels=2, nr_samples=2048,
                        sampling_rate=2000.0, nr_bytes_to_encode=3)


def make_stream(cfg, rng, blocks=3):
    n = cfg.nr_samples * blocks
    t = np.arange(n)
    sig = (4000 * np.sin(t / 50.0)[None, :]
           + rng.normal(0, 40, (cfg.nr_channels, n))).astype(np.int32)
    v = np.ascontiguousarray(sig.T).astype(np.uint32)
    b = np.zeros((*v.shape, 3), np.uint8)
    for k in range(3):
        b[..., k] = (v >> np.uint32(8 * k)) & np.uint32(0xFF)
    return b.reshape(-1)


def test_unfiltered_roundtrip_chunked(cfg, rng):
    data = make_stream(cfg, rng, 3)
    enc = StreamingCodec(cfg)
    dec = StreamingDecoder(cfg)
    frames = []
    # irregular chunk sizes exercise the ring staging
    for chunk in np.array_split(data, 17):
        frames += enc.push(chunk)
    assert len(frames) == 3
    out = b"".join(dec.push(f) for f in frames)
    assert out == data.tobytes()
    assert enc.flush_stats()["cr"] > 1.5


def test_filtered_pipeline_matches_reference_style(cfg, rng):
    # pre-filter (reference rspt_test.cpp:120-136 pattern) then pack;
    # decode returns the FILTERED signal losslessly
    b, a = design.create_filter_iir(
        design.FilterKind.BUTTERWORTH, design.FilterType.BAND_PASS, 2,
        cfg.sampling_rate, 0.4, 200.0)
    cfg.filter_coeffs = (a, b)
    data = make_stream(cfg, rng, 2)
    enc = StreamingCodec(cfg)
    frames = enc.push(data)
    assert len(frames) == 2
    dec = StreamingDecoder(cfg)
    out = b"".join(dec.push(f) for f in frames)
    # filtered-then-packed: decode equals the filtered int32 stream
    from rspt_tpu.filters.streaming import IirFilter
    from rspt_tpu.ops import numpy_ops as nops
    sig = nops.native_to_i32(data.tobytes(), cfg.nr_samples * 2,
                             cfg.nr_channels, 3)
    want = np.empty_like(sig)
    for j in range(cfg.nr_channels):
        f = IirFilter(n=a, d=b)
        f.init_history_values(float(sig[j][0]), int(cfg.sampling_rate))
        # the pipeline filters block-by-block with carried state
        y0 = f.process(sig[j][:cfg.nr_samples].astype(np.float64))
        y1 = f.process(sig[j][cfg.nr_samples:].astype(np.float64))
        want[j] = np.concatenate([y0, y1]).astype(np.int32)
    got = nops.native_to_i32(out, cfg.nr_samples * 2, cfg.nr_channels, 3)
    np.testing.assert_array_equal(got, want)


def test_pipelined_native_frames_match_per_frame_path(cfg, rng):
    """The fused native span pipeline (pipelined producer/consumer
    overlap since r5) must emit container bytes identical to the
    Python per-frame path: filter_span + per-block packer compress
    (the reference's frame-by-frame usage, rspt_test.cpp:114-137)."""
    b, a = design.create_filter_iir(
        design.FilterKind.BUTTERWORTH, design.FilterType.BAND_PASS, 2,
        cfg.sampling_rate, 0.4, 200.0)
    cfg.filter_coeffs = (a, b)
    data = make_stream(cfg, rng, 3)
    enc_native = StreamingCodec(cfg)
    frames_native = enc_native.push(data)

    enc_py = StreamingCodec(cfg)
    enc_py._try_fused_native = lambda span: False
    frames_py = enc_py.push(data)
    assert len(frames_native) == len(frames_py) == 3
    assert [bytes(f) for f in frames_native] == \
        [bytes(f) for f in frames_py]


def test_state_checkpoint_resume(cfg, rng):
    data = make_stream(cfg, rng, 2)
    half = len(data) // 2
    enc1 = StreamingCodec(cfg)
    frames_a = enc1.push(data[:half])
    st = enc1.get_state()
    enc2 = StreamingCodec(cfg)
    enc2.set_state(st)
    frames_b = enc2.push(data[half:])
    whole = StreamingCodec(cfg)
    frames_w = whole.push(data)
    assert [bytes(f) for f in frames_a + frames_b] == \
        [bytes(f) for f in frames_w]
