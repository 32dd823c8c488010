"""TPU-native compute ops: norms, activations, RoPE, attention over a paged KV
pool, MoE routing, Mamba2 chunked scan, batched sampling, and the Pallas
kernels under ops/pallas/.

These replace the reference's pure-Go hot loops (purego/tensor/tensor.go
MatMul, attention.go score loops, moe.go expert GEMMs, mamba2.go scan) with
XLA/MXU-friendly batched formulations; the Pallas subpackage holds the fused
kernels (paged attention, INT8/INT4 dequant+matmul).
"""
