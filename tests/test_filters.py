"""Filter design + streaming + JAX batch filters vs the C++ oracle."""

import numpy as np
import pytest

from rspt_tpu.filters import design, streaming


DESIGNS = [
    # (kind, type, order, fs, lo, hi)
    (1, design.FilterType.LOW_PASS, 2, 2000.0, 100.0, 0.0),
    (1, design.FilterType.HIGH_PASS, 2, 2000.0, 0.4, 0.0),
    (1, design.FilterType.LOW_PASS, 1, 1000.0, 3.0, 0.0),
    (1, design.FilterType.HIGH_PASS, 1, 500.0, 1.0, 0.0),
    (1, design.FilterType.BAND_PASS, 2, 2000.0, 10.0, 20.0),
    (1, design.FilterType.BAND_PASS, 1, 1000.0, 15.0, 25.0),
    (1, design.FilterType.BAND_PASS, 2, 2000.0, 0.4, 200.0),
]


@pytest.mark.parametrize("kind,ftype,order,fs,lo,hi", DESIGNS)
def test_design_matches_reference(ref, kind, ftype, order, fs, lo, hi):
    got_b, got_a = design.create_filter_iir(
        design.FilterKind.BUTTERWORTH, ftype, order, fs, lo, hi)
    want = ref.design_iir(kind, int(ftype), order, fs, lo, hi)
    assert want is not None
    want_b, want_a = want
    np.testing.assert_array_equal(got_b, want_b)  # bit-exact f64
    np.testing.assert_array_equal(got_a, want_a)


def _oracle_iir(ref, a, b):
    import ctypes
    n_arr = (ctypes.c_double * len(a))(*a)
    d_arr = (ctypes.c_double * len(b))(*b)
    return ref.lib.ref_new_iir(n_arr, d_arr, len(a))


@pytest.mark.parametrize("opt", [False, True])
def test_iir_streaming_bit_exact(ref, rng, opt):
    b, a = design.butterworth_bandpass_2nd(2000.0, 0.4, 200.0)
    f = streaming.IirFilter(n=a, d=b)
    of = _oracle_iir(ref, a, b)
    x = rng.normal(0, 1000, 5000)
    call = ref.lib.ref_filter_opt if opt else ref.lib.ref_filter
    mine = f.filter_opt if opt else f.filter
    for v in x:
        assert mine(float(v)) == call(of, float(v))


def test_iir_warmup_bit_exact(ref, rng):
    b, a = design.butterworth_2nd(design.FilterType.LOW_PASS, 2000.0, 100.0)
    f = streaming.IirFilter(n=a, d=b)
    of = _oracle_iir(ref, a, b)
    f.init_history_values(123.0, 50)
    ref.lib.ref_init_history(of, 123.0, 50)
    for v in rng.normal(0, 500, 100):
        assert f.filter_opt(float(v)) == ref.lib.ref_filter_opt(of, float(v))


def test_fir_streaming_bit_exact(ref, rng):
    import ctypes
    kernel = [0.111, 0.222, 0.333, 0.222, 0.111]
    k_arr = (ctypes.c_double * 5)(*kernel)
    of = ref.lib.ref_new_fir(k_arr, 5)
    f = streaming.FirFilter(kernel)
    for v in rng.normal(0, 100, 500):
        assert f.filter(float(v)) == ref.lib.ref_filter(of, float(v))


def test_native_process_matches_python(rng):
    b, a = design.butterworth_bandpass_2nd(2000.0, 10.0, 20.0)
    x = rng.normal(0, 1000, 2000)
    f1 = streaming.IirFilter(n=a, d=b)
    y1 = f1.process(x, opt=True)
    f2 = streaming.IirFilter(n=a, d=b)
    y2 = np.array([f2.filter_opt(float(v)) for v in x])
    np.testing.assert_array_equal(y1, y2)


class TestJaxFilters:
    @pytest.fixture(autouse=True)
    def _jax(self):
        pytest.importorskip("jax")

    def test_iir_assoc_close_to_serial(self, rng):
        from rspt_tpu.filters import jax_filters
        b, a = design.butterworth_2nd(design.FilterType.LOW_PASS,
                                      2000.0, 100.0)
        x = rng.normal(0, 1000, 4096).astype(np.float32)
        y_assoc, _ = jax_filters.iir_apply(x, a, b, mode="assoc")
        y_scan, _ = jax_filters.iir_apply(x, a, b, mode="scan")
        f = streaming.IirFilter(n=a, d=b)
        y_ref = np.array([f.filter_opt(float(v)) for v in x])
        assert np.allclose(np.asarray(y_scan), y_ref, rtol=1e-3, atol=1e-1)
        assert np.allclose(np.asarray(y_assoc), np.asarray(y_scan),
                           rtol=1e-3, atol=1e-1)

    def test_iir_state_streaming_equals_onepass(self, rng):
        from rspt_tpu.filters import jax_filters
        b, a = design.butterworth_bandpass_2nd(2000.0, 10.0, 20.0)
        x = rng.normal(0, 100, 2048).astype(np.float32)
        y_full, _ = jax_filters.iir_apply(x, a, b, mode="scan")
        y1, st = jax_filters.iir_apply(x[:1000], a, b, mode="scan")
        y2, _ = jax_filters.iir_apply(x[1000:], a, b, zi=st, mode="scan")
        got = np.concatenate([np.asarray(y1), np.asarray(y2)])
        assert np.allclose(got, np.asarray(y_full), rtol=1e-4, atol=1e-3)

    def test_fir_matches_streaming(self, rng):
        from rspt_tpu.filters import jax_filters
        kernel = [0.1, -0.2, 0.4, -0.2, 0.1]
        x = rng.normal(0, 10, 300).astype(np.float32)
        y, _ = jax_filters.fir_apply(x, kernel)
        f = streaming.FirFilter(kernel)
        y_ref = np.array([f.filter(float(v)) for v in x], np.float32)
        assert np.allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-4)

    def test_multichannel_vmap_shape(self, rng):
        from rspt_tpu.filters import jax_filters
        b, a = design.butterworth_2nd(design.FilterType.LOW_PASS, 1000.0, 40.0)
        x = rng.normal(0, 1, (12, 1024)).astype(np.float32)
        y, (xz, yz) = jax_filters.iir_apply(x, a, b)
        assert y.shape == (12, 1024) and xz.shape == (12, 2)
