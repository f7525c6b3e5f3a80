"""Signal packers — engine-selecting factory API.

Mirrors i_signal_packer's factories (reference: signal_packer.h:59-72)
with an ``engine`` argument:

* ``"native"`` — all-C++ multithreaded host runtime: lowest latency,
  no accelerator needed (packers/native.py).
* ``"tpu"``    — JAX device pipeline: sharded batch compression at
  accelerator scale (packers/tpu.py).
* ``"host"``   — numpy/Python reference engine (packers/host.py).
* ``"auto"``   — native if the C++ runtime builds, else tpu if JAX has
  a non-CPU backend, else host.

All engines emit byte-identical containers (tests/test_engines.py).
"""

from __future__ import annotations

from . import container, host


def _resolve(engine: str) -> str:
    if engine != "auto":
        return engine
    try:
        from ..native import bindings as nb
        nb._load()
        return "native"
    except Exception:
        pass
    try:
        import jax
        if jax.default_backend() != "cpu":
            return "tpu"
    except Exception:
        pass
    return "host"


def _mod(engine: str):
    engine = _resolve(engine)
    if engine == "native":
        from . import native as m
    elif engine == "tpu":
        from . import tpu as m
    elif engine == "host":
        from . import host as m
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return m


def new_hzr(bytes_per_sample, nr_channels, nr_samples, engine="auto", **kw):
    return _mod(engine).new_hzr(bytes_per_sample, nr_channels, nr_samples,
                                **kw)


def new_xdelta_hzr(bytes_per_sample, nr_channels, nr_samples,
                   nr_bytes_to_encode, engine="auto", **kw):
    return _mod(engine).new_xdelta_hzr(
        bytes_per_sample, nr_channels, nr_samples, nr_bytes_to_encode, **kw)


def new_dct(bytes_per_sample, nr_channels, nr_samples, engine="auto", **kw):
    return _mod(engine).new_dct(bytes_per_sample, nr_channels, nr_samples,
                                **kw)


def new_hadamard(bytes_per_sample, nr_channels, nr_samples, engine="auto",
                 **kw):
    return _mod(engine).new_hadamard(bytes_per_sample, nr_channels,
                                     nr_samples, **kw)
