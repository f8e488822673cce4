# Convenience targets (the compute path needs no build; the native C++
# runtime auto-builds on first use — this just makes it explicit).

.PHONY: all native test test-fast test-full golden bench check clean

all: native

native:
	g++ -O3 -std=gnu++17 -shared -fPIC \
	  kreeq_tpu/native/kreeq_native.cpp \
	  -o kreeq_tpu/native/libkreeq_native.so -lz

# iteration gate (<3 min): everything not marked slow
test-fast:
	python3 -m pytest tests/ -q -m "not slow"

# full unit suite (~8 min: includes the multi-process CLI parity and
# 8M-keys/device sharded scale tests)
test-full:
	python3 -m pytest tests/ -q

test: test-full

golden:
	bin/kreeq-validate /root/reference/validateFiles

bench:
	python3 bench.py

# full local gate: unit suite + golden corpus
check: test golden

clean:
	rm -f kreeq_tpu/native/libkreeq_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
