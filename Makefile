# Pre-driver checklist — run before a round ends. Each target is the
# exact command the committed evidence files were produced with.

SF_DRIVER ?= /root/testdata/sf0.01
SF_SMOKE  ?= /root/testdata/sf0.001

.PHONY: test sweep sweep-smoke bench bench-scaling all

# Full suite: unit/property/streaming/chaos + the complete
# queries()/oracle_sql() board vs DuckDB at sf0.001.
test:
	python -m pytest tests/ -x -q

# Pre-driver board sweep at the driver's exact tier (sf0.01) —
# the source of docs/SWEEP_sf0.01_r*.md. Pass query names to target.
sweep:
	python scripts/check_oracle.py $(SF_DRIVER)

sweep-smoke:
	python scripts/check_oracle.py $(SF_SMOKE)

# Graded-config benchmark (sf0.1, local[32] + interleaved scale pair).
bench:
	python bench.py

# Just the graded scaling pair (median of 3 interleaved ratios).
bench-scaling:
	python bench.py --scaling-only

all: test sweep bench
