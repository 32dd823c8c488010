#!/usr/bin/env bash
# End-to-end recipe on REAL checkpoints (VERDICT r1 #5): build tiny HF
# checkpoints with real tokenizer files, then drive every user-facing CLI on
# the current JAX backend (the real chip when run outside tests):
#   CLI -> tokenizer -> loader -> engine -> device -> detokenize
# plus logit parity vs HF torch and the dPPL INT8-vs-bf16 gate.
# Random tiny weights => garbage TEXT is expected; the checks are flow,
# parity numbers, and exit codes.
set -euo pipefail
cd "$(dirname "$0")/.."
PY=${PY:-python}
T=${TIMEOUT:-580}
ARCHS=${ARCHS:-gpt2 llama}

for arch in $ARCHS; do
  dir=/tmp/e2e-tiny-$arch
  echo "=== $arch: build checkpoint ==="
  timeout "$T" $PY scripts/make_tiny_ckpt.py $arch "$dir"

  echo "=== $arch: ask (streaming engine path) ==="
  timeout "$T" $PY -m cli.ask --model-dir "$dir" --max-tokens 16 "Hello there"

  echo "=== $arch: batch runner ==="
  MODEL_DIR="$dir" timeout "$T" $PY -m cli.run_batch --max-tokens 8

  echo "=== $arch: logit parity vs HF ==="
  timeout "$T" $PY -m cli.check_logits --model-dir "$dir" --hf-compare

  echo "=== $arch: strided PPL + dPPL gate (INT8) ==="
  timeout "$T" $PY -m cli.eval_ppl --model-dir "$dir" --window 64 --stride 32 --quantization int8
done
echo "e2e OK"
