# Convenience targets; the Python package also builds the native library
# on demand (ribbit_tpu/native.py) so none of this is required.

CC ?= cc
CFLAGS ?= -O3 -march=native -shared -fPIC -pthread
SRCS = csrc/ribbit_core.c csrc/ribbit_refine.c csrc/ribbit_align.c \
       csrc/ribbit_vote.c

.PHONY: all native oracle test bench clean

all: native

native: build/ribbit_native.so

build/ribbit_native.so: $(SRCS)
	mkdir -p build
	$(CC) $(CFLAGS) $(SRCS) -o $@ -lm

oracle:
	bash tools/oracle/build.sh

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -rf build
