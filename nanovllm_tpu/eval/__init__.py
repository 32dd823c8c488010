"""Evaluation harnesses: perplexity (quantization-quality acceptance gates —
ΔPPL ≤0.1 @INT8, ≤0.5 @INT4 vs bf16, BASELINE.json) and logit parity."""
