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


def _mod(engine: str, kw=None):
    requested = engine
    engine = _resolve(engine)
    # The LZ4 plane backend (container.PLANE_LZ4 method-byte flag) is a
    # host-side serving option — sequential byte matching is not a TPU
    # kernel, mirroring the reference where LZ4 is plain C
    # (signal_packer_base.cpp:73-76, dormant there, live here). The
    # native engine's MT pipeline is hzr-specialized, so LZ4 containers
    # run through the host packers (the plane codec itself is the
    # native C++ LZ4 when librspt_native is available).
    pb = kw.pop("plane_backend", "hzr") if kw is not None else "hzr"
    if pb == "lz4":
        if requested == "tpu":
            raise ValueError(
                "plane_backend='lz4' is host-side; use engine='host', "
                "'native', or 'auto'")
        engine = "host"
        kw["plane_backend"] = "lz4"
    elif pb != "hzr":
        raise ValueError(f"unknown plane backend {pb!r}")
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
    return _mod(engine, kw).new_hzr(bytes_per_sample, nr_channels, nr_samples,
                                    **kw)


def new_xdelta_hzr(bytes_per_sample, nr_channels, nr_samples,
                   nr_bytes_to_encode, engine="auto", **kw):
    return _mod(engine, kw).new_xdelta_hzr(
        bytes_per_sample, nr_channels, nr_samples, nr_bytes_to_encode, **kw)


def new_dct(bytes_per_sample, nr_channels, nr_samples, engine="auto", **kw):
    return _mod(engine, kw).new_dct(bytes_per_sample, nr_channels,
                                    nr_samples, **kw)


def new_hadamard(bytes_per_sample, nr_channels, nr_samples, engine="auto",
                 **kw):
    return _mod(engine, kw).new_hadamard(bytes_per_sample, nr_channels,
                                         nr_samples, **kw)
