"""rspt_tpu — TPU-native real-time signal processing & compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++
``rspt`` library: block compression of multi-channel sampled signals
(hzr RLE+Huffman entropy coding, xdelta preprocessing, DCT/Hadamard
lossy transforms), streaming IIR/FIR filtering with Butterworth design,
peak detection, rolling median, and ring-buffer ingest — data-parallel
over TPU device meshes.
"""

__version__ = "0.1.0"
