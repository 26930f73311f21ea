# bwtpu top-level targets
.PHONY: all native test test-all bench smoke clean

all: native

native:
	$(MAKE) -C csrc

# fast suite (target < 6 min); the `scale` tier (268 Mbp int32 row
# math at 22 min, heaviest multihost 2-process cases) runs via test-all.
# pytest.ini's addopts already deselects `scale`; the explicit -m ""
# in test-all overrides it.
test: native
	python -m pytest tests/ -q

test-all: native
	python -m pytest tests/ -q -m ""

# trace/shape check of the exact bench entry the driver runs — run this
# before every commit touching the engine (VERDICT r1 item 10)
smoke:
	python bench.py --smoke --cpu --batch 256

bench: native
	python bench.py

clean:
	$(MAKE) -C csrc clean
