# bwtpu top-level targets
.PHONY: all native test bench smoke clean

all: native

native:
	$(MAKE) -C csrc

test: native
	python -m pytest tests/ -q

# trace/shape check of the exact bench entry the driver runs — run this
# before every commit touching the engine (VERDICT r1 item 10)
smoke:
	python bench.py --smoke --cpu --batch 256

bench: native
	python bench.py

clean:
	$(MAKE) -C csrc clean
