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

.PHONY: verify quick test parity scale bench

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
