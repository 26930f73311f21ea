# bwtpu top-level targets
.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C csrc clean
