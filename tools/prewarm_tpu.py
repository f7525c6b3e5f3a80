"""Pre-warm build/jax_cache with the bench-shape TPU graphs.

Run after changing device code so `python bench.py`'s TPU phase only
replays cached compiles (tunneled XLA compiles take minutes cold).
"""

import os
import runpy
import sys

sys.argv = ["bench_tpu"]
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_tpu.py"), run_name="__main__")
