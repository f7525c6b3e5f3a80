# Convenience targets (the package itself is pure-import; the native
# runtime auto-builds on first use).

.PHONY: native ref test test-fast bench scaling clean

native:
	python tools/build_native.py

ref:
	python tools/build_reference.py

test: native
	python tools/run_tests.py

test-fast: native
	python -m pytest tests/ -q -x -k "not jax_hzr and not tpu_packers"

bench: native
	python bench.py

scaling:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python tools/bench_scaling.py

clean:
	rm -rf build/*.o build/librspt_native.so build/librspt_ref.so
