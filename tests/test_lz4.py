"""LZ4 plane backend — clean-room block codec.

Covers:
* Python spec codec (formats/lz4_block.py) self-roundtrip + fuzz
* native codec (rspt_native.cpp) self-roundtrip + spec agreement
* interop BOTH directions against the reference's vendored lz4.c /
  lz4hc.c (built into the oracle shim by tools/build_reference.py) —
  the reference keeps these as a dormant alternate plane backend
  (signal_packer_base.cpp:26-28,73-76,107-109)
* container/packer-level dispatch via the method byte's 0x40 flag
* malformed-input rejection
"""

import numpy as np
import pytest

import rspt_tpu.packers as packers
from rspt_tpu.formats import lz4_block
from rspt_tpu.native import bindings as nb
from rspt_tpu.packers import container


def _cases(rng):
    return [
        b"",
        b"a",
        b"ab",
        b"abcd" * 4,
        b"x" * 12,
        b"x" * 13,
        b"hello world " * 400,
        bytes(rng.integers(0, 256, 65, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),   # random
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),     # low entropy
        (b"\x00" * 70000) + b"tail",    # run longer than the offset window
        bytes(rng.integers(0, 2, 300, dtype=np.uint8)) * 300,  # periodic
    ]


class TestSpecCodec:
    def test_roundtrip(self, rng):
        for data in _cases(rng):
            comp = lz4_block.compress(data)
            assert lz4_block.decompress(comp, len(data)) == data

    def test_fuzz_roundtrip(self, rng):
        for _ in range(50):
            n = int(rng.integers(0, 3000))
            alpha = int(rng.integers(2, 257))
            data = bytes(rng.integers(0, alpha, n, dtype=np.uint16) % 256)
            comp = lz4_block.compress(data)
            assert lz4_block.decompress(comp, len(data)) == data

    def test_rejects_malformed(self, rng):
        data = b"the quick brown fox " * 50
        comp = bytearray(lz4_block.compress(data))
        with pytest.raises(ValueError):
            lz4_block.decompress(b"", 0)
        with pytest.raises(ValueError):  # truncated stream
            lz4_block.decompress(bytes(comp[:-3]), len(data))
        with pytest.raises(ValueError):  # wrong target size
            lz4_block.decompress(bytes(comp), len(data) + 1)


class TestNativeCodec:
    def test_matches_spec_decode(self, rng):
        """Native decode accepts spec-encoder output and vice versa."""
        for data in _cases(rng):
            c_py = lz4_block.compress(data)
            c_nat = nb.lz4_compress(data)
            assert nb.lz4_decompress(c_py, len(data)) == data
            assert lz4_block.decompress(c_nat, len(data)) == data

    def test_fuzz_roundtrip(self, rng):
        for _ in range(100):
            n = int(rng.integers(0, 100000))
            alpha = int(rng.integers(2, 257))
            data = bytes(rng.integers(0, alpha, n, dtype=np.uint16) % 256)
            comp = nb.lz4_compress(data)
            assert nb.lz4_decompress(comp, len(data)) == data

    def test_rejects_malformed(self, rng):
        data = bytes(rng.integers(0, 8, 5000, dtype=np.uint8))
        comp = nb.lz4_compress(data)
        with pytest.raises(ValueError):
            nb.lz4_decompress(comp[:-2], len(data))
        with pytest.raises(ValueError):
            nb.lz4_decompress(comp, len(data) - 1)
        # corrupted offsets/tokens must error or produce wrong-size
        # output, never crash
        rng2 = np.random.default_rng(7)
        buf = np.frombuffer(comp, np.uint8).copy()
        for _ in range(200):
            i = int(rng2.integers(0, buf.size))
            old = buf[i]
            buf[i] = rng2.integers(0, 256)
            try:
                nb.lz4_decompress(buf.tobytes(), len(data))
            except ValueError:
                pass
            buf[i] = old


class TestReferenceInterop:
    def test_ours_to_reference(self, ref, rng):
        for data in _cases(rng):
            if not data:
                continue  # oracle wrapper requires n > 0
            for comp in (nb.lz4_compress(data), lz4_block.compress(data)):
                assert ref.lz4_decompress(comp, len(data)) == data

    def test_reference_to_ours(self, ref, rng):
        for data in _cases(rng):
            if not data:
                continue
            for comp in (ref.lz4_compress(data),
                         ref.lz4_compress(data, hc=9)):
                assert nb.lz4_decompress(comp, len(data)) == data
                assert lz4_block.decompress(comp, len(data)) == data

    def test_hc_roundtrip_and_interop(self, ref, rng):
        """Clean-room LZ4HC-class compressor (hash-chain + lazy): every
        stream must decode through our native decoder, the Python spec
        decoder, AND the reference's vendored lz4.c."""
        for data in _cases(rng):
            if not data:
                continue
            comp = nb.lz4_compress_hc(data)
            assert nb.lz4_decompress(comp, len(data)) == data
            assert lz4_block.decompress(comp, len(data)) == data
            assert ref.lz4_decompress(comp, len(data)) == data

    def test_hc_ratio(self, ref, real_ecg12):
        """HC must never lose to our greedy matcher, and at default
        depth must land within 20% of the reference's LZ4HC level 9 on
        the real fixture planes (deeper chains close the rest:
        depth 4096 measured BELOW ref HC9 on the sparse planes)."""
        from rspt_tpu.ops import numpy_ops as nops
        vals = np.frombuffer(real_ecg12, "<i4").astype(np.int32)
        planes = nops.plane_split(vals, 4)
        for k in range(4):
            data = planes[k].tobytes()
            hc = len(nb.lz4_compress_hc(data))
            greedy = len(nb.lz4_compress(data))
            refhc = len(ref.lz4_compress(data, hc=9))
            assert hc <= greedy, (k, hc, greedy)
            assert hc <= refhc * 1.20, (k, hc, refhc)

    def test_ratio_competitive_on_real_ecg(self, ref, real_ecg12):
        """The clean-room greedy encoder must not trail the reference's
        LZ4_compress_default by more than 2% on the real fixture planes."""
        from rspt_tpu.ops import numpy_ops as nops
        vals = np.frombuffer(real_ecg12, "<i4").astype(np.int32)
        planes = nops.plane_split(vals, 4)
        for k in range(4):
            data = planes[k].tobytes()
            ours = len(nb.lz4_compress(data))
            refn = len(ref.lz4_compress(data))
            assert ours <= refn * 1.02, (k, ours, refn)


class TestContainerDispatch:
    def test_method_flag_roundtrip(self, rng):
        enc = rng.integers(-1000, 1000, (3, 256), dtype=np.int32)
        comp = container.compress_i32(enc, container.PLANE_LZ4, 4)
        assert comp[0] == container.PLANE_LZ4
        method, _, merged, consumed = container.decompress_i32(
            comp, 4, enc.size)
        assert method == container.PLANE_LZ4
        assert consumed == len(comp)
        np.testing.assert_array_equal(merged, enc.reshape(-1))

    def test_hzr_streams_unchanged(self, rng):
        """Flag-free containers stay byte-identical to the hzr format."""
        enc = rng.integers(-100, 100, (2, 128), dtype=np.int32)
        assert container.compress_i32(enc, 0, 4)[0] == 0

    @pytest.mark.parametrize("engine", ["host", "auto"])
    def test_packer_lz4_backend(self, engine, ecg3):
        p = packers.new_xdelta_hzr(3, 3, 1024, 3, engine=engine,
                                   plane_backend="lz4")
        raw = bytes(ecg3[1][:3 * 3 * 1024])
        comp = p.compress(raw)
        assert comp[0] & container.PLANE_LZ4
        out, consumed = p.decompress(comp)
        assert bytes(out) == raw and consumed == len(comp)
        # an hzr-backend packer of the same shape rejects the stream is
        # NOT required — the method byte makes decode self-describing:
        q = packers.new_xdelta_hzr(3, 3, 1024, 3, engine="host")
        out2, _ = q.decompress(comp)
        assert bytes(out2) == raw

    def test_tpu_engine_rejects_lz4(self):
        with pytest.raises(ValueError):
            packers.new_hzr(4, 2, 512, engine="tpu", plane_backend="lz4")

    def test_packer_lz4hc_backend(self, rng):
        """plane_backend='lz4hc' streams carry the same 0x40 flag and
        decode through the standard path (format interop), smaller or
        equal to the greedy backend."""
        from rspt_tpu.packers import host as hpack
        ch, n = 3, 9000
        sig = np.cumsum(rng.normal(0, 12, (ch, n)), axis=1).astype(
            np.int32)
        native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
        p_hc = hpack.new_xdelta_hzr(4, ch, n, 3, plane_backend="lz4hc")
        p_g = hpack.new_xdelta_hzr(4, ch, n, 3, plane_backend="lz4")
        c_hc = p_hc.compress(native)
        c_g = p_g.compress(native)
        assert c_hc[0] & container.PLANE_LZ4
        assert len(c_hc) <= len(c_g)
        # decodes through the ordinary (greedy-constructed) packer too
        out, _ = p_g.decompress(c_hc)
        assert out == native

    def test_hzr_packer_lz4(self, rng):
        raw = rng.integers(-(1 << 20), 1 << 20, 2 * 512,
                           dtype=np.int32).tobytes()
        p = packers.new_hzr(4, 2, 512, engine="host", plane_backend="lz4")
        comp = p.compress(raw)
        out, _ = p.decompress(comp)
        assert bytes(out) == raw
