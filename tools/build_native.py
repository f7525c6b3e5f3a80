"""Build librspt_native.so from rspt_tpu/native/rspt_native.cpp."""

from __future__ import annotations

import os
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, "rspt_tpu", "native", "rspt_native.cpp")
BUILD = os.path.join(HERE, "build")
LIB = os.path.join(BUILD, "librspt_native.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) > os.path.getmtime(SRC)):
        return LIB
    os.makedirs(BUILD, exist_ok=True)
    subprocess.check_call([
        # -ffp-contract=off: no FMA fusion — the DCT kernels must round
        # each float product exactly like the reference build does.
        "g++", "-O3", "-march=native", "-funroll-loops", "-std=c++17",
        "-ffp-contract=off",
        "-fPIC", "-shared", "-pthread", SRC, "-o", LIB,
    ])
    return LIB


if __name__ == "__main__":
    print(build(force=True))
