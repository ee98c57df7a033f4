# Developer targets (counterpart of the reference Makefile:16-40)

install:
	pip install --no-deps -e .

test:
	python -m pytest tests -q

test-fast:
	python -m pytest tests -q -m "not slow" -x

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -pthread makani_tpu/native/reader.cpp -o makani_tpu/native/libreader.so

format:
	black --line-length 120 makani_tpu tests bench.py 2>/dev/null || true

.PHONY: install test test-fast bench native format
