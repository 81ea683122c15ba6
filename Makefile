CXX ?= g++
CXXFLAGS ?= -O3 -fPIC -shared -std=c++17 -march=native -pthread

native: simpleworks_tpu/native/libswtpu_native.so

simpleworks_tpu/native/libswtpu_native.so: csrc/swtpu_native.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

# device kernel legs only, appended to the committed BENCH_LOCAL.jsonl —
# run whenever the tunnel is alive so an end-of-round wedge cannot blank
# the device record
bench-snapshot:
	python bench.py --snapshot

clean:
	rm -f simpleworks_tpu/native/libswtpu_native.so

.PHONY: native test test-slow bench bench-snapshot clean
