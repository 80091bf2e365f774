# Developer targets (reference Makefile:18-23 parity)

.PHONY: test test-unit test-integration test-tpu native bench clean

test: test-unit

# the unit tier builds the native GRIB decoder first so its fast path is
# exercised end-to-end (tests fall back to pure Python when absent)
test-unit: native
	python -m pytest tests/ -q -m "not integ and not tpu"

test-integration:
	python -m pytest tests/ -q -m "integ" --override-ini addopts=""

test-tpu:
	SKYRIM_TEST_TPU=1 python -m pytest tests/ -q -m "tpu" --override-ini addopts=""

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-suite:
	python bench_suite.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d | xargs rm -rf
