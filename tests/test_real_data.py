"""Parity on the reference's REAL shipped ECG fixtures (extracted from
the .7z archives by tools/sevenz.py) — the exact workloads of the
reference's test_1 and test_7 (rspt_test.cpp:160-178, 288-304)."""

import pytest

import rspt_tpu.packers as packers


class TestRealEcg12:
    """12-ch 32-bit 34199-sample ECG — BASELINE config 2."""

    CH, N, BPS = 12, 34199, 4

    @pytest.mark.parametrize("nbytes", [1, 2, 3, 4])
    def test_xdelta_all_plane_counts_vs_reference(self, ref, real_ecg12,
                                                  nbytes):
        # test_7 varies nr_bytes_to_encode 1..4 (rspt_test.cpp:405-433)
        want, rc, want_out, _ = ref.roundtrip(
            "xdelta_hzr", real_ecg12, self.BPS, self.CH, self.N, nbytes)
        p = packers.new_xdelta_hzr(self.BPS, self.CH, self.N, nbytes,
                                   engine="native")
        comp = p.compress(real_ecg12)
        assert comp == want
        out, _ = p.decompress(comp)
        assert bytes(out) == want_out == real_ecg12

    def test_xdelta_compression_ratio(self, real_ecg12):
        p = packers.new_xdelta_hzr(self.BPS, self.CH, self.N, 3,
                                   engine="native")
        comp = p.compress(real_ecg12)
        cr = len(real_ecg12) / len(comp)
        assert cr > 2.0, cr  # real ECG compresses decently

    def test_hzr_vs_reference(self, ref, real_ecg12):
        want, rc, want_out, _ = ref.roundtrip(
            "hzr", real_ecg12, self.BPS, self.CH, self.N)
        p = packers.new_hzr(self.BPS, self.CH, self.N, engine="native")
        comp = p.compress(real_ecg12)
        assert comp == want
        out, _ = p.decompress(comp)
        assert bytes(out) == real_ecg12


class TestRealEcg3:
    """3-ch 24-bit 2 kSps ECG stream — test_1 fixture."""

    CH, BPS = 3, 3

    def _n(self, data):
        return len(data) // (self.CH * self.BPS)

    def test_xdelta_vs_reference(self, ref, real_ecg3):
        n = self._n(real_ecg3)
        want, rc, want_out, _ = ref.roundtrip(
            "xdelta_hzr", real_ecg3, self.BPS, self.CH, n, 3)
        p = packers.new_xdelta_hzr(self.BPS, self.CH, n, 3, engine="native")
        comp = p.compress(real_ecg3)
        assert comp == want
        out, _ = p.decompress(comp)
        assert bytes(out) == real_ecg3

    def test_dct_vs_reference(self, ref, real_ecg3):
        # test_1 runs dct on truncated length 4096 (rspt_test.cpp:148-152)
        n = 4096
        data = real_ecg3[:n * self.CH * self.BPS]
        want, rc, want_out, _ = ref.roundtrip("dct", data, self.BPS,
                                              self.CH, n)
        p = packers.new_dct(self.BPS, self.CH, n, engine="native")
        comp = p.compress(data)
        assert comp == want
        out, _ = p.decompress(comp)
        assert bytes(out) == want_out

    def test_hadamard_vs_reference(self, ref, real_ecg3):
        # test truncates FWHT to 16384 (rspt_test.cpp:144-147)
        n = 16384
        data = real_ecg3[:n * self.CH * self.BPS]
        want, rc, want_out, _ = ref.roundtrip("hadamard", data, self.BPS,
                                              self.CH, n)
        p = packers.new_hadamard(self.BPS, self.CH, n, engine="native")
        comp = p.compress(data)
        assert comp == want
        out, _ = p.decompress(comp)
        assert bytes(out) == want_out

    def test_tpu_engine_on_real_data(self, ref, real_ecg3):
        pytest.importorskip("jax")
        n = self._n(real_ecg3)
        want, _, _, _ = ref.roundtrip("xdelta_hzr", real_ecg3, self.BPS,
                                      self.CH, n, 3)
        p = packers.new_xdelta_hzr(self.BPS, self.CH, n, 3, engine="tpu")
        assert p.compress(real_ecg3) == want
