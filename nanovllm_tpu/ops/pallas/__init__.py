"""Pallas TPU kernels — the "native code" of this framework.

The reference's performance-critical loops are pure Go
(SURVEY.md §2: MatMul tensor.go:62-88, attention score loops, MoE GEMMs,
Mamba2 scan); their TPU-native equivalents live here as Mosaic/Pallas
kernels: fused INT8/INT4 dequant+matmul (quant_matmul.py) and paged decode
attention over the block pool (paged_attention.py).
"""
