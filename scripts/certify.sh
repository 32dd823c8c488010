#!/usr/bin/env bash
# One-command QUALITY CERTIFICATION for a real checkpoint (VERDICT r3 #7):
#
#   make certify MODEL_DIR=/path/to/checkpoint
#
# Chains, with pass/fail exit code:
#   1. cli.check_logits --hf-compare   — logit parity vs HF transformers CPU
#      (argmax match required; max|delta| printed)
#   2. cli.eval_ppl --gate             — strided perplexity at bf16, INT8 and
#      INT4, enforcing the BASELINE acceptance gates:
#        dPPL(int8) <= 0.1,  dPPL(int4) <= 0.5
#
# CAVEAT (state of this environment): no checkpoint egress exists here, so
# these gates have only ever run against RANDOM-weight tiny checkpoints
# (scripts/make_tiny_ckpt.py) — flow-verified, numbers not meaningful. The
# day a real pretrained checkpoint is reachable, certification is exactly
# this one command, zero new work.
#
# Env: TEXT_FILE= optional corpus (default: the built-in sample),
#      WINDOW/STRIDE= eval geometry, TIMEOUT= per-step timeout seconds.
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${PY:-python}
T=${TIMEOUT:-1800}
: "${MODEL_DIR:?usage: make certify MODEL_DIR=/path/to/checkpoint}"
WINDOW=${WINDOW:-1024}
STRIDE=${STRIDE:-512}
EXTRA=()
if [ -n "${TEXT_FILE:-}" ]; then EXTRA+=(--text-file "$TEXT_FILE"); fi

echo "=== certify: logit parity vs HF ($MODEL_DIR) ==="
timeout "$T" $PY -m cli.check_logits --model-dir "$MODEL_DIR" --hf-compare

echo "=== certify: dPPL gates (bf16 vs int8/int4) ==="
timeout "$T" $PY -m cli.eval_ppl --model-dir "$MODEL_DIR" \
  --window "$WINDOW" --stride "$STRIDE" \
  --quantization int8 int4 --gate "${EXTRA[@]}"

echo "CERTIFY PASS: $MODEL_DIR"
