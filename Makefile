# Convenience targets. Tests force the CPU backend internally.

.PHONY: test test-all test-fast bench bench-int8 bench-float bench-train lint e2e

test:
	python -m pytest tests/ -q

test-all:  # includes slow full-resolution + subprocess tests
	python -m pytest tests/ -q -m ""

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_e2e.py --ignore=tests/test_quantized.py

e2e:
	python -m pytest tests/test_e2e.py -q

bench:
	python bench.py

bench-int8:  # int8 is the bench default; kept for muscle memory
	python bench.py

bench-float:
	python bench.py --float

bench-train:
	python bench.py --mode train --batch-size 32

lint:
	python -m compileall -q ssd_tensorflow_tpu tests tools
