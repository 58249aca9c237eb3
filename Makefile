# Test / benchmark entry points (used by CI and locally).
# The test config (tests/conftest.py) forces the CPU backend with 8 virtual
# devices and float64 — the parity-suite environment.

PY ?= python

.PHONY: test test-debug-nans bench-quick bench docs

test:
	$(PY) -m pytest tests/ -q

# NaN sanitizer (SURVEY §5): rerun the numerical core with jax_debug_nans on
test-debug-nans:
	WAVELETSEXT_DEBUG_NANS=1 $(PY) -m pytest tests/test_dwt.py \
	    tests/test_swt.py tests/test_acwt.py tests/test_basis.py -q

# CPU smoke of all five benchmark configs (~1 min warm)
bench-quick:
	JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= $(PY) benchmarks/run_all.py --quick

# the real-chip north-star metric (one JSON line)
bench:
	$(PY) bench.py

# regenerate the API reference from docstrings
docs:
	$(PY) docs/gen_api.py
