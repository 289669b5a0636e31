# Convenience targets (the reference's Makefile builds binaries; here the
# "build" is the optional native library, everything else is Python).

.PHONY: all native test test-fast bench bench-matrix clean

all: native

native:
	python native/build.py

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not tooling and not sharding"

bench:
	python bench.py

bench-matrix:
	python scripts/benchmark.py --quick --out benchmark_results.csv

clean:
	rm -f native/libnbody_native.so positions.bin energy.bin
