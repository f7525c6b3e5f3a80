"""rspt_tpu — TPU-native real-time signal processing & compression framework.

A from-scratch JAX/XLA/Pallas + native-C++ re-design of the capabilities
of the C++ ``rspt`` library: block compression of multi-channel sampled
signals (hzr RLE+Huffman entropy coding, xdelta preprocessing,
DCT/Hadamard lossy transforms), streaming IIR/FIR filtering with
Butterworth design, peak detection, rolling median, and ring-buffer
ingest — data-parallel over TPU device meshes, byte-identical to the
reference formats.

Quick start::

    import rspt_tpu
    p = rspt_tpu.packers.new_xdelta_hzr(4, 12, 34199, 3)  # bps, ch, n
    comp = p.compress(native_bytes)
    out, consumed = p.decompress(comp)

Subpackages: ``packers`` (engine-selecting factories), ``filters``,
``analysis``, ``parallel`` (mesh sharding), ``containers``, ``io``,
``pipeline`` (streaming codec), ``utils`` (metrics), ``hzr`` (codec
internals), ``ops`` (exact kernels), ``native`` (C++ runtime bindings).
"""

from . import packers  # noqa: F401

__version__ = "0.1.0"
__all__ = ["packers", "filters", "analysis", "parallel", "containers",
           "io", "pipeline", "utils", "hzr", "ops", "native"]


def __getattr__(name):
    # lazy subpackage access (keeps `import rspt_tpu` light; jax loads
    # only when a device path is touched)
    if name in __all__:
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
