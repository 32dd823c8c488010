# Capability parity with the reference Makefile (/root/reference/Makefile):
# build is a no-op for Python; test/fmt/vet/demo/bench targets provided.

PY ?= python

.PHONY: all test test-fast bench demo ask fmt vet clean native demo-capitals e2e

# Real-checkpoint end-to-end on the current backend (tiny HF ckpts, all CLIs,
# HF logit parity, dPPL gate). See scripts/e2e_real_ckpt.sh.
e2e:
	bash scripts/e2e_real_ckpt.sh

# One-command quality certification for a real checkpoint: HF logit parity +
# dPPL acceptance gates (int8 <= 0.1, int4 <= 0.5) with pass/fail exit code.
# Usage: make certify MODEL_DIR=/path/to/checkpoint
# (Caveat: only ever exercised on random-weight tiny ckpts in this
# environment — no checkpoint egress. See scripts/certify.sh.)
certify:
	MODEL_DIR=$(MODEL_DIR) bash scripts/certify.sh

all: test

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

demo:
	$(PY) -m cli.simple_demo

# Usage: make ask MODEL_DIR=/path/to/ckpt Q="What is the capital of France?"
ask:
	$(PY) -m cli.ask --model-dir $(MODEL_DIR) "$(Q)"

demo-capitals:
	bash demo_capitals.sh

fmt:
	-$(PY) -m black nanovllm_tpu cli tests 2>/dev/null || true

vet:
	$(PY) -m compileall -q nanovllm_tpu cli tests

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

native:
	g++ -O2 -std=c++17 -shared -fPIC native/host_ops.cc -o native/libnvhost.so
