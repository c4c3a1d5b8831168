# One-command verification for a fresh checkout/context.
#
#   make verify   — the full gate: unit+property+plan tests, the
#                   sf0.01 oracle-parity mirror of the driver's
#                   correctness check, then the sf0.1 bench suite.
#   make quick    — parity + scale-plan regressions only (~3 min),
#                   the fastest meaningful green.
#
# All targets exit non-zero on the first failure.

PY ?= python
SF_PARITY ?= /root/testdata/sf0.01

#   make ladder Q=name1,name2
#                 — the per-change adversarial ladder for a query
#                   list: sf0.01 oracle parity, then fuzz-shape
#                   parity on ALL THREE degenerate shapes
#                   (empty/one/skew — empty is mandatory: the r12
#                   skew_report regression was only visible there),
#                   then the sf1 wall-ratio spot (generates
#                   .sf1data on first use).

.PHONY: verify quick test parity scale bench ladder

verify: test parity bench

quick: parity scale

test:
	$(PY) -m pytest tests/ -x -q

parity:
	$(PY) tests/run_parity.py $(SF_PARITY)

scale:
	$(PY) -m pytest tests/test_scale_plans.py tests/test_sf_scaling.py \
	    tests/test_plan_lint.py -q

bench:
	$(PY) bench.py

ladder:
	@test -n "$(Q)" || { echo "usage: make ladder Q=name1,name2"; exit 2; }
	$(PY) tests/run_parity.py $(SF_PARITY) $(Q)
	FUZZ_SHAPE=empty $(PY) tools/fuzz_parity.py 1 $(Q)
	FUZZ_SHAPE=one $(PY) tools/fuzz_parity.py 1 $(Q)
	FUZZ_SHAPE=skew $(PY) tools/fuzz_parity.py 1 $(Q)
	@test -d .sf1data || $(PY) tools/gen_sf1.py
	$(PY) tools/spot_sf1.py $(Q)
