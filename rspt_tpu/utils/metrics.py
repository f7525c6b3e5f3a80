"""Quality/throughput metrics.

The reference reports CR (original/compressed bytes, rspt_test.cpp:86)
and PRDN — normalized percentage RMS difference against the
mean-removed original (rspt_test.cpp:98-111, formula README.md:106-108).
These are the first-class metrics of the framework's structured results
(bench.py), plus bytes/s and mesh scaling efficiency.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..ops import numpy_ops as nops


def compression_ratio(original_bytes: int, compressed_bytes: int) -> float:
    return original_bytes / compressed_bytes


def prdn(original: np.ndarray, decoded: np.ndarray) -> float:
    """PRDN in percent (rspt_test.cpp:98-111): channel-major int32
    arrays; mean uses the reference's average_32."""
    orig = np.asarray(original, np.float64)
    dec = np.asarray(decoded, np.float64)
    mse = float(((orig - dec) ** 2).sum())
    origg = 0.0
    for ch in range(orig.shape[0]):
        mean = float(nops.average32(np.asarray(original[ch], np.int32)))
        origg += float(((orig[ch] - mean) ** 2).sum())
    if origg == 0:
        return 0.0
    return float(np.sqrt(mse / origg) * 100.0)


def throughput(nbytes: int, seconds: float) -> Dict[str, float]:
    return {"bytes": nbytes, "seconds": seconds,
            "gbps": nbytes / seconds / 1e9}
