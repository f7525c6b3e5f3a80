"""All packer engines emit byte-identical containers."""

import numpy as np
import pytest

import rspt_tpu.packers as packers


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(1234)
    ch, n = 4, 4096
    sig = np.cumsum(rng.normal(0, 500, (ch, n)), axis=1).astype(np.int32)
    return ch, n, np.ascontiguousarray(sig.T).astype("<i4").tobytes()


KINDS = [("hzr", {}), ("xdelta_hzr", {"nr_bytes_to_encode": 3}),
         ("dct", {}), ("hadamard", {})]


@pytest.mark.parametrize("kind,kw", KINDS)
def test_engines_agree(payload, kind, kw):
    ch, n, native = payload
    factory = getattr(packers, f"new_{kind}")
    streams = {}
    outs = {}
    for engine in ("host", "native", "tpu"):
        if engine == "tpu":
            pytest.importorskip("jax")
        args = [4, ch, n] + ([kw["nr_bytes_to_encode"]]
                             if "nr_bytes_to_encode" in kw else [])
        p = factory(*args, engine=engine)
        streams[engine] = p.compress(native)
        out, _ = p.decompress(streams[engine])
        outs[engine] = bytes(out)
    assert streams["host"] == streams["native"] == streams["tpu"]
    assert outs["host"] == outs["native"] == outs["tpu"]
    if kind in ("hzr", "xdelta_hzr"):
        assert outs["host"] == native


def test_auto_engine_resolves(payload):
    ch, n, native = payload
    p = packers.new_xdelta_hzr(4, ch, n, 3, engine="auto")
    comp = p.compress(native)
    out, _ = p.decompress(comp)
    assert out == native
