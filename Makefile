# Clearing PALLAS_AXON_POOL_IPS must happen in the *shell* env: the axon
# PJRT plugin registers at interpreter boot via sitecustomize, before
# conftest.py runs, and leaves the process doing relay I/O even when tests
# select the CPU backend (~10x slowdown).
TEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-full bench
# fast tier: < 5 min on one core, still touches every solver family /
# subsystem (one kept representative each — see tests/conftest.py)
test:
	$(TEST_ENV) python -m pytest tests/ -x -q -m "not slow"

# everything, ~55 min on one core
test-full:
	$(TEST_ENV) python -m pytest tests/ -x -q

bench:
	python bench.py
