CXX ?= g++
CXXFLAGS ?= -O3 -Wall -Wextra -fPIC -std=c++17

LIBDIR := poreplex_tpu/native_lib
LIB := $(LIBDIR)/libpptpu_sigproc.so

all: $(LIB)

$(LIB): src/sigproc.cc
	mkdir -p $(LIBDIR)
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

clean:
	rm -f $(LIB)

test: all
	python -m pytest tests/ -x -q

.PHONY: all clean test
