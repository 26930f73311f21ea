# bwtpu top-level targets
.PHONY: all native test test-all bench smoke clean

all: native

native:
	$(MAKE) -C csrc

# fast suite (~5 min); the `scale` tier (268 Mbp int32 row math, 22 min
# on this host) runs via test-all
test: native
	python -m pytest tests/ -q -m "not scale"

test-all: native
	python -m pytest tests/ -q

# trace/shape check of the exact bench entry the driver runs — run this
# before every commit touching the engine (VERDICT r1 item 10)
smoke:
	python bench.py --smoke --cpu --batch 256

bench: native
	python bench.py

clean:
	$(MAKE) -C csrc clean
