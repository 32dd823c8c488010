#!/usr/bin/env bash
# Capability parity with /root/reference/demo_capitals.sh: ask the model the
# capital of 8 countries and grep the answers. Requires MODEL_DIR to point at
# a checkpoint (e.g. GPT-2 small).
set -u
MODEL_DIR="${MODEL_DIR:?set MODEL_DIR to a checkpoint directory}"

countries=(France Germany Japan Italy Spain Canada Brazil Egypt)
for c in "${countries[@]}"; do
    echo "=== ${c} ==="
    python -m cli.ask --model-dir "$MODEL_DIR" --max-tokens 24 \
        "Question: What is the capital of ${c}? Answer:" --raw 2>/dev/null | head -2
done
