# Build/test entry points (reference analogue: build.cake targets).

PYTHON ?= python

.PHONY: install test test-fast bench native clean

install:
	$(PYTHON) -m pip install -e . --no-build-isolation

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PYTHON) bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 -o storage_tpu/native/libstorage_host_ops.so csrc/storage_host_ops.cpp

clean:
	rm -rf build *.egg-info storage_tpu/native/libstorage_host_ops.so
	find . -name __pycache__ -type d -exec rm -rf {} +
