"""TPU-path packers: byte-identical streams vs host packers and the C++
reference; plus the sharded (8-device CPU mesh) encoder."""

import numpy as np
import pytest

pytest.importorskip("jax")

from rspt_tpu.packers import host as hpack  # noqa: E402
from rspt_tpu.packers import tpu as tpack  # noqa: E402


class TestTpuPackers:
    def test_hzr_matches_host_and_roundtrips(self, ecg3):
        sig, native = ecg3
        ch, n = sig.shape
        tp = tpack.new_hzr(3, ch, n)
        comp = tp.compress(native)
        hp = hpack.new_hzr(3, ch, n)
        assert comp == hp.compress(native)
        out, consumed = tp.decompress(comp)
        assert out == native and consumed == len(comp)

    def test_xdelta_matches_host_and_roundtrips(self, ecg12):
        sig, native = ecg12
        ch, n = sig.shape
        tp = tpack.new_xdelta_hzr(4, ch, n, 3)
        comp = tp.compress(native)
        hp = hpack.new_xdelta_hzr(4, ch, n, 3)
        assert comp == hp.compress(native)
        out, consumed = tp.decompress(comp)
        assert out == native

    def test_xdelta_vs_reference(self, ref, ecg12):
        sig, native = ecg12
        ch, n = sig.shape
        want, rc, want_out, _ = ref.roundtrip("xdelta_hzr", native, 4, ch, n, 3)
        tp = tpack.new_xdelta_hzr(4, ch, n, 3)
        comp = tp.compress(native)
        assert comp == want
        out, _ = tp.decompress(comp)
        assert out == want_out == native

    def test_dct_vs_reference(self, ref, rng):
        ch, n = 3, 1024
        t = np.arange(n)
        sig = (3000 * np.sin(t / 11.0)[None, :]
               + rng.normal(0, 30, (ch, n))).astype(np.int32)
        lim = 2 ** 23 - 1
        sig = np.clip(sig, -lim, lim)
        native = b"".join(
            int(v).to_bytes(3, "little", signed=True)
            for v in np.ascontiguousarray(sig.T).ravel())
        want_comp, rc, want_out, _ = ref.roundtrip("dct", native, 3, ch, n)
        tp = tpack.new_dct(3, ch, n)
        comp = tp.compress(native)
        assert comp == want_comp
        out, _ = tp.decompress(comp)
        assert out == want_out

    def test_hadamard_vs_reference(self, ref, rng):
        ch, n = 2, 4096
        sig = (rng.normal(0, 5000, (ch, n))).astype(np.int32)
        native = np.ascontiguousarray(sig.T).astype("<i4").tobytes()
        want_comp, rc, want_out, _ = ref.roundtrip("hadamard", native, 4, ch, n)
        tp = tpack.new_hadamard(4, ch, n)
        comp = tp.compress(native)
        assert comp == want_comp
        out, _ = tp.decompress(comp)
        assert out == want_out


class TestShardedEncoder:
    def test_sharded_hzr_bit_exact(self, rng):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        from rspt_tpu.hzr import pyref
        from rspt_tpu.parallel.mesh import ShardedHzrEncoder
        data = rng.integers(0, 50, 500000, np.int64).astype(np.uint8)
        enc = ShardedHzrEncoder()
        got = enc.encode(data)
        assert got == pyref.encode(data)
        assert pyref.decode(got) == data.tobytes()

    def test_sharded_flat_pack_bit_exact(self, rng):
        """Per-shard flat exact-offset encode (interpret-mode Pallas
        under shard_map on the virtual mesh) equals the spec encoder."""
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        from rspt_tpu.hzr import pyref
        from rspt_tpu.parallel.mesh import ShardedHzrEncoder
        from rspt_tpu.hzr import jax_coder
        data = rng.integers(0, 50, 500000, np.int64).astype(np.uint8)
        blocks_np, lengths_np = jax_coder._split_blocks(data)
        enc = ShardedHzrEncoder()
        res = enc.encode_blocks_flat(blocks_np, lengths_np,
                                     interpret=True)
        assert res is not None, "flat path unexpectedly declined"
        got = jax_coder.assemble_compact(*res)
        assert got == pyref.encode(data)

    def test_sharded_packer_pipeline(self, ecg12):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        from rspt_tpu.parallel.mesh import ShardedHzrEncoder
        sig, native = ecg12
        ch, n = sig.shape
        tp = tpack.new_xdelta_hzr(4, ch, n, 3,
                                  encoder=ShardedHzrEncoder())
        comp = tp.compress(native)
        hp = hpack.new_xdelta_hzr(4, ch, n, 3)
        assert comp == hp.compress(native)


class TestShardedScans:
    def test_scan_carry_exchange(self, rng):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        from rspt_tpu.ops import numpy_ops as nops
        from rspt_tpu.parallel.mesh import make_mesh
        from rspt_tpu.parallel.scans import make_sharded_scans
        mesh = make_mesh()
        fns = make_sharded_scans(mesh)
        n = 8 * 4096
        a = rng.integers(-(2**31), 2**31, n, np.int64).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(fns["delta_encode"](a)), nops.delta_encode(a))
        np.testing.assert_array_equal(
            np.asarray(fns["xor_encode"](a)), nops.xor_encode(a))
        d = nops.delta_encode(a)
        np.testing.assert_array_equal(
            np.asarray(fns["delta_decode"](d)), nops.delta_decode(d))
        x = nops.xor_encode(a)
        np.testing.assert_array_equal(
            np.asarray(fns["xor_decode"](x)), nops.xor_decode(x))


class TestShardedDecodeHints:
    def test_sharded_hints_roundtrip(self, rng):
        """Sharded aligned-decode hints skip every fixpoint sweep (and
        its per-sweep ppermute); bytes stay identical."""
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        from rspt_tpu.hzr import pyref
        from rspt_tpu.parallel.mesh import ShardedHzrDecoder
        payload = np.concatenate([
            rng.integers(0, 10, 90000).astype(np.uint8),
            np.zeros(30000, np.uint8),
            rng.integers(0, 256, 5000).astype(np.uint8)])
        st = pyref.encode(payload)
        dec = ShardedHzrDecoder()
        outs, hints = dec.decode_many([st], return_hints=True)
        assert outs[0] == payload.tobytes()
        assert dec.decode_many([st], hints=hints)[0] == payload.tobytes()
