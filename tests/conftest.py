import os
import sys

# Multi-chip tests run on a virtual 8-device CPU mesh; set this before
# any jax import. The environment may pin JAX_PLATFORMS to the real TPU
# ('axon'); tests force CPU unless RSPT_TEST_TPU=1 is set — the env var
# alone is not reliably honored, so also use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("RSPT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# Persistent compile cache: the XLA CPU compiler has segfaulted on the
# suite's largest program late in a long full-suite process (same
# program compiles fine in isolation — state-dependent compiler crash,
# not a program bug). Caching makes reruns LOAD earlier compiles, so
# repeated runs converge past any crash point, and the full suite drops
# from ~10 min of compiles to ~2.
try:
    import jax as _jax
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "build", "jax_cache")
    os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: a FRESH deterministic generator per test. A
    # shared stateful generator made every test's data depend on which
    # tests ran before it — full-suite vs isolation then compiled
    # different jit programs (one such order-dependent shape
    # deterministically crashed the XLA CPU compiler).
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def ref():
    """Compiled C++ reference oracle (skips if unavailable)."""
    try:
        from tools.build_reference import get_ref
        return get_ref()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {e}")


def make_ecg_like(rng, channels, samples, scale=300.0, bits=24):
    """Synthetic ECG-ish random-walk signal, channel-major int32."""
    walk = np.cumsum(rng.normal(0, scale, (channels, samples)), axis=1)
    beat = 0.4 * scale * np.sin(np.arange(samples) / 37.0) ** 63
    x = (walk + beat * 2 ** (bits - 12)).astype(np.int64)
    lim = 2 ** (bits - 1) - 1
    return np.clip(x, -lim, lim).astype(np.int32)


def to_native(arr: np.ndarray, bps: int) -> bytes:
    """Channel-major int32 → interleaved native little-endian bytes."""
    v = np.ascontiguousarray(arr.T).astype(np.uint32)
    b = np.zeros((*v.shape, bps), dtype=np.uint8)
    for k in range(bps):
        b[..., k] = (v >> np.uint32(8 * k)) & np.uint32(0xFF)
    return b.tobytes()


# Data fixtures use their OWN seeded generators: the shared `rng`
# fixture is stateful, so drawing from it would make fixture DATA
# depend on which tests ran first — full-suite vs isolation then
# compile different jit programs (one such order-dependent shape
# deterministically crashed the XLA CPU compiler at 87% of the suite).
@pytest.fixture(scope="session")
def ecg3():
    sig = make_ecg_like(np.random.default_rng(313), 3, 20000, 300.0, 24)
    return sig, to_native(sig, 3)


@pytest.fixture(scope="session")
def ecg12():
    sig = make_ecg_like(np.random.default_rng(1212), 12, 34199,
                        50000.0, 32)
    return sig, to_native(sig, 4)


@pytest.fixture(scope="session")
def sine32():
    sig = (np.sin(np.arange(8192) / 100.0) * 1000.0).astype(np.int32)
    return sig.reshape(1, -1), sig.tobytes()


def _extract_fixture(name):
    import os
    path = os.path.join(os.environ.get("RSPT_REFERENCE", "/root/reference"),
                        "lib_rspt_test", name)
    from tools.sevenz import extract_single
    return extract_single(path)


@pytest.fixture(scope="session")
def real_ecg3():
    """The reference's shipped 3-ch 24-bit 2 kSps ECG (data_stream.7z,
    test_1 fixture). Returns native interleaved bytes."""
    try:
        return _extract_fixture("data_stream.7z")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"fixture unavailable: {e}")


@pytest.fixture(scope="session")
def real_ecg12():
    """The reference's shipped 12-ch 32-bit 34199-sample ECG
    (test_7 fixture / BASELINE config 2). Native interleaved bytes."""
    try:
        return _extract_fixture(
            "12_chan_32bit_34199_samples_r00000135fghd8.raw.7z")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"fixture unavailable: {e}")
