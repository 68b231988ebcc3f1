CXX ?= g++
CXXFLAGS ?= -O3 -Wall -Wextra -fPIC -std=c++17

LIBDIR := poreplex_tpu/native_lib
LIB := $(LIBDIR)/libpptpu_sigproc.so
LIBF5 := $(LIBDIR)/libpptpu_fast5.so

all: $(LIB) $(LIBF5)

$(LIB): src/sigproc.cc
	mkdir -p $(LIBDIR)
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

# native FAST5 ingest (dlopen'd libhdf5; see src/fast5_ingest.cc)
$(LIBF5): src/fast5_ingest.cc
	mkdir -p $(LIBDIR)
	$(CXX) $(CXXFLAGS) -shared -o $@ $< -ldl

clean:
	rm -f $(LIB) $(LIBF5) $(LIBDIR)/libpptpu_sigproc_chaos.so

# fault-injection build (counterpart of the reference's dormant
# CHAOSMONKEY macros, src/contrib/scrappie/scrappie_stdlib.h): 5% of
# allocations fail; the C ABI returns error sentinels instead of crashing
chaos: src/sigproc.cc
	mkdir -p $(LIBDIR)
	$(CXX) $(CXXFLAGS) -DCHAOSMONKEY=0.05 -shared \
	    -o $(LIBDIR)/libpptpu_sigproc_chaos.so $<

test: all
	python -m pytest tests/ -x -q

.PHONY: all clean chaos test
