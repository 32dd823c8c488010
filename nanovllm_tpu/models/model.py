"""Generic transformer forward over a paged KV pool.

The TPU-native counterpart of the reference's TransformerModel
(/root/reference/purego/tensor/generic_model.go) — one assembly covering
GPT-2 (MHA, learned positions, GELU, LayerNorm), Llama 3.x (GQA, RoPE,
SwiGLU, RMSNorm), Granite MoE (GQA + top-k experts + muP multipliers),
Falcon (MQA, parallel blocks), Mistral (sliding-window GQA) and Granite 4.0
hybrid (Mamba2 layers interleaved with attention) — but functional and
shape-stable:

  - `prefill_chunk`: one sequence's (possibly prefix-cached) prompt chunk,
    padded to a length bucket; writes K/V into the pool via slot mapping and
    attends over the pool window, so chunked prefill and prefix-cache reuse
    fall out of the same code path. Unlike the reference, prefix-cache hits
    actually SKIP computation (the reference always recomputes the full
    prompt — SURVEY.md §2.5-1).
  - `decode_step`: fixed-size batch of single-token steps over block tables
    (real continuous batching at the model level; the reference loops
    sequences serially — SURVEY.md §2.5-2).

Both are pure functions of (params, pool, inputs) → (outputs, pool) and are
jitted by the runner with the pool donated.

muP details follow the reference exactly (generic_model.go:298-301 embedding
multiplier, :320-325 residual multiplier on both branches, :473-477 logits
DIVIDED by logits_scaling; attention_multiplier as the softmax scale,
attention.go:360-364).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import (
    ActivationType,
    BlockStyle,
    LayerKind,
    ModelConfig,
    NormType,
    PositionType,
)
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.ops.activations import gelu_tanh, swiglu
from nanovllm_tpu.ops.attention import attention_chunk, attention_decode
from nanovllm_tpu.ops.linear import linear
from nanovllm_tpu.ops.norms import apply_norm
from nanovllm_tpu.ops.rope import apply_rope, compute_inv_freq, rope_cos_sin
from nanovllm_tpu.ops import moe as moe_ops
from nanovllm_tpu.ops import mamba2 as mamba_ops

import os as _os

# Tri-state: None = auto (TPU + non-quantized pool + long context window),
# True/False = forced. Env override: NANOVLLM_PAGED=1/0.
_USE_PAGED_KERNEL: bool | None = (
    None if _os.environ.get("NANOVLLM_PAGED") not in ("0", "1")
    else _os.environ.get("NANOVLLM_PAGED") == "1"
)
# Below this context-window bucket, the batched XLA gather beats the
# per-lane page-DMA kernel (too few pages to pipeline; measured 3.4k vs
# 2.1k tok/s at a 256-token bucket on Llama-1B). The kernel's exact-traffic
# advantage takes over as the window grows.
PAGED_KERNEL_MIN_CTX = 1024
# Same idea for the flash prefill kernel: below this context window the
# dense-gather prefill is fine (score matrix is small); above it the flash
# kernel avoids the O(T*S) score materialization and 3x gather traffic.
# Env override: NANOVLLM_FLASH_PREFILL=0/1.
FLASH_PREFILL_MIN_CTX = 1024
_USE_FLASH_PREFILL: bool | None = (
    None if _os.environ.get("NANOVLLM_FLASH_PREFILL") not in ("0", "1")
    else _os.environ.get("NANOVLLM_FLASH_PREFILL") == "1"
)


def set_use_flash_prefill(flag: bool | None) -> None:
    global _USE_FLASH_PREFILL
    _USE_FLASH_PREFILL = flag


def _flash_prefill_ok(ctx_bucket: int, T: int) -> bool:
    if T % 8 != 0:
        return False
    if _USE_FLASH_PREFILL is not None:
        return _USE_FLASH_PREFILL
    return jax.default_backend() == "tpu" and ctx_bucket >= FLASH_PREFILL_MIN_CTX


def set_use_paged_kernel(flag: bool | None) -> None:
    global _USE_PAGED_KERNEL
    _USE_PAGED_KERNEL = flag


def _paged_kernel_ok(ctx_bucket: int) -> bool:
    if _USE_PAGED_KERNEL is not None:
        return _USE_PAGED_KERNEL
    return jax.default_backend() == "tpu" and ctx_bucket >= PAGED_KERNEL_MIN_CTX


# ---------------------------------------------------------------------------
# Parameter initialization (random weights — used by tests and benchmarks;
# real checkpoints come from io/safetensors_loader.py)
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, seed: int = 0, numpy: bool = False) -> dict:
    """Random params. numpy=True returns the host-side pytree (for
    quantization before device placement)."""
    rng = np.random.default_rng(seed)
    dt = np.dtype(jnp.dtype(cfg.dtype).name) if cfg.dtype != "bfloat16" else np.float32

    def dense(n_in, n_out, bias):
        p = {"w": (rng.standard_normal((n_in, n_out)) * (0.02)).astype(np.float32)}
        if bias:
            p["b"] = np.zeros((n_out,), np.float32)
        return p

    def norm(n, with_bias):
        p = {"scale": np.ones((n,), np.float32)}
        if with_bias:
            p["bias"] = np.zeros((n,), np.float32)
        return p

    E = cfg.hidden_size
    D = cfg.head_dim
    ln_bias = cfg.norm_type == NormType.LAYERNORM
    params: dict = {
        "embed": (rng.standard_normal((cfg.vocab_size, E)) * 0.02).astype(np.float32),
    }
    if cfg.position_type == PositionType.LEARNED:
        params["pos_embed"] = (rng.standard_normal((cfg.max_seq_len, E)) * 0.01).astype(np.float32)
    blocks = []
    for i in range(cfg.num_layers):
        if cfg.layer_kind(i) == LayerKind.MAMBA2:
            blocks.append(
                {
                    "ln1": norm(E, ln_bias),
                    "mamba": mamba_ops.init_mamba_params(cfg, rng),
                    "ln2": norm(E, ln_bias),
                    "mlp": _init_mlp(cfg, rng, dense),
                }
            )
            continue
        blk = {
            "ln1": norm(E, ln_bias),
            "attn": {
                "q": dense(E, cfg.num_heads * D, cfg.attn_bias),
                "k": dense(E, cfg.num_kv_heads * D, cfg.attn_bias),
                "v": dense(E, cfg.num_kv_heads * D, cfg.attn_bias),
                "o": dense(cfg.num_heads * D, E, cfg.attn_bias),
            },
        }
        if not (cfg.block_style == BlockStyle.PARALLEL and cfg.parallel_single_ln):
            blk["ln2"] = norm(E, ln_bias)
        if cfg.num_experts:
            blk["moe"] = moe_ops.init_moe_params(cfg, rng)
        else:
            blk["mlp"] = _init_mlp(cfg, rng, dense)
        blocks.append(blk)
    params["blocks"] = blocks
    params["final_norm"] = norm(E, ln_bias)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(E, cfg.vocab_size, bias=False)
    params["rope_inv_freq"] = compute_inv_freq(cfg.rotary_dim, cfg.rope_theta, cfg.rope_scaling)
    if numpy:
        return params
    return to_device_params(params, cfg)


def _init_mlp(cfg: ModelConfig, rng, dense):
    E, I = cfg.hidden_size, cfg.intermediate_size
    if cfg.activation == ActivationType.SWIGLU:
        return {"up": dense(E, 2 * I, cfg.mlp_bias), "down": dense(I, E, cfg.mlp_bias)}
    return {"up": dense(E, I, cfg.mlp_bias), "down": dense(I, E, cfg.mlp_bias)}


FP32_PARAM_NAMES = (
    "scale", "bias", "rope_inv_freq", "b", "A_log", "D", "dt_bias", "norm_scale",
)


def to_device_params(params, cfg: ModelConfig, device: bool = True):
    """Cast float weights to cfg.dtype (norm scales / biases / rope tables /
    quantization scales stay fp32) and move to device arrays. device=False
    performs the same casts host-side (numpy + ml_dtypes bf16) so a sharded
    device_put can transfer each host's shards directly without staging a
    full replicated copy on device first."""
    from nanovllm_tpu.ops.quant import QuantLinear

    dt = jnp.dtype(cfg.dtype)
    mk = jnp.asarray if device else np.asarray

    def leaf(x, keep_fp32: bool):
        x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
        if keep_fp32 or x.dtype.kind in "iu":
            return mk(x)
        return mk(x, dtype=dt) if device else np.asarray(x).astype(dt)

    def walk(node, name=""):
        if isinstance(node, QuantLinear):
            return QuantLinear(
                leaf(node.qw, False),
                leaf(node.scale, True),
                None if node.b is None else leaf(node.b, True),
                node.mode, node.n_in, node.n_out,
            )
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return leaf(node, name in FP32_PARAM_NAMES)

    return walk(params)


def tile_quant_params(params):
    """Permute every int4/int8 QuantLinear to the tiled HBM layout
    (ops/quant.tile_quant: contiguous kernel grid-block DMAs). Single-mesh
    only — structural transforms (TP sharding, shard streaming) require the
    canonical [Kq, N] layout, so the runner applies this LAST, and only
    when no mesh is in play."""
    from nanovllm_tpu.ops.quant import QuantLinear, tile_quant

    def walk(node):
        if isinstance(node, QuantLinear):
            return tile_quant(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def stack_blocks(params: dict) -> dict:
    """Stack the per-layer block list into layer-leading arrays so the
    forward can lax.scan over layers (one compiled layer body). Only valid
    for homogeneous stacks (non-hybrid models with identical per-layer
    structure, which is every supported family except Granite 4.0 hybrid)."""
    blocks = params["blocks"]
    if not isinstance(blocks, list):
        return params
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {**params, "blocks": stacked}


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _mlp_forward(cfg: ModelConfig, p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["up"], x)
    if cfg.activation == ActivationType.SWIGLU:
        h = swiglu(h)
    else:
        h = gelu_tanh(h)
    return linear(p["down"], h)


def _ffn_forward(
    cfg: ModelConfig, blk: dict, x: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    if "moe" in blk:
        return moe_ops.moe_forward(cfg, blk["moe"], x, valid_mask)
    return _mlp_forward(cfg, blk["mlp"], x)


def _qkv(cfg: ModelConfig, ap: dict, x: jnp.ndarray):
    T = x.shape[0]
    if "qkv" in ap:
        # Fused projection (fuse_qkv_params): one matmul / one quant-kernel
        # dispatch for all three. Segments sit at padded_out_dim-aligned
        # offsets (the quantized layout pads each part's columns per that
        # rule; the dense fusion zero-pads to match).
        from nanovllm_tpu.ops.quant import padded_out_dim

        nq = cfg.num_heads * cfg.head_dim
        nkv = cfg.num_kv_heads * cfg.head_dim
        nq_p = padded_out_dim(nq)
        nkv_p = padded_out_dim(nkv)
        z = linear(ap["qkv"], x)
        q = z[:, :nq].reshape(T, cfg.num_heads, cfg.head_dim)
        k = z[:, nq_p:nq_p + nkv].reshape(T, cfg.num_kv_heads, cfg.head_dim)
        v = z[:, nq_p + nkv_p:nq_p + nkv_p + nkv].reshape(T, cfg.num_kv_heads, cfg.head_dim)
        return q, k, v
    q = linear(ap["q"], x).reshape(T, cfg.num_heads, cfg.head_dim)
    k = linear(ap["k"], x).reshape(T, cfg.num_kv_heads, cfg.head_dim)
    v = linear(ap["v"], x).reshape(T, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


def fuse_qkv_params(params: dict) -> dict:
    """Host-side transform: concatenate each block's q/k/v projection weights
    along the output dim so the input-side attention projections run as ONE
    matmul (one Pallas dispatch when quantized) per layer. Exactly
    numerics-preserving: INT8 per-out-channel and INT4 per-(group, channel)
    scales are independent per output column, so quantize(concat(dense)) ==
    concat(quantized parts) — which also means already-quantized QuantLinear
    triples can be fused directly. Single-mesh only (TP shards q/k/v over
    heads separately)."""
    import numpy as np

    from nanovllm_tpu.ops.quant import QuantLinear

    def pad_cols(a, width):
        a = np.asarray(a)
        return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, width - a.shape[-1])])

    def cat_dense(qp, kp, vp):
        # Zero-pad each part's columns to the padded_out_dim segment widths
        # the quantized layout uses, so _qkv's offsets are layout-independent.
        from nanovllm_tpu.ops.quant import padded_out_dim

        qw, kw, vw = (np.asarray(p["w"]) for p in (qp, kp, vp))
        nq_p = padded_out_dim(qw.shape[1])
        nkv_p = padded_out_dim(kw.shape[1])
        fused = {"w": np.concatenate(
            [pad_cols(qw, nq_p), pad_cols(kw, nkv_p), np.asarray(vw)], axis=1
        )}
        if "b" in qp:
            fused["b"] = np.concatenate([
                pad_cols(np.asarray(qp["b"])[None], nq_p)[0],
                pad_cols(np.asarray(kp["b"])[None], nkv_p)[0],
                np.asarray(vp["b"]),
            ])
        return fused

    def cat_quant(qp, kp, vp):
        # Each part's qw/scale columns are already padded to 128-multiples,
        # which are exactly the fused segment offsets _qkv uses.
        b = None
        if qp.b is not None:
            b = np.concatenate([
                pad_cols(np.asarray(qp.b)[None], qp.qw.shape[1])[0],
                pad_cols(np.asarray(kp.b)[None], kp.qw.shape[1])[0],
                np.asarray(vp.b),
            ])
        return QuantLinear(
            np.concatenate([np.asarray(qp.qw), np.asarray(kp.qw), np.asarray(vp.qw)], axis=1),
            np.concatenate([np.asarray(qp.scale), np.asarray(kp.scale), np.asarray(vp.scale)], axis=-1),
            b, qp.mode, qp.n_in,
            qp.qw.shape[1] + kp.qw.shape[1] + vp.n_out,
        )

    for blk in params["blocks"]:
        ap = blk.get("attn")
        if not ap or not all(k in ap for k in ("q", "k", "v")):
            continue
        qp, kp, vp = ap["q"], ap["k"], ap["v"]
        kinds = {isinstance(p, QuantLinear) for p in (qp, kp, vp)}
        if len(kinds) > 1:
            continue  # mixed dense/quantized triple (size-gated quantization)
        fused = cat_quant(qp, kp, vp) if kinds.pop() else cat_dense(qp, kp, vp)
        blk["attn"] = {"qkv": fused, "o": ap["o"]}
    return params


def _use_rope(cfg: ModelConfig, layer_idx: int) -> bool:
    if cfg.position_type != PositionType.ROPE:
        return False
    if cfg.is_hybrid and not cfg.hybrid_attn_rope:
        return False
    return True


def _embed(cfg: ModelConfig, params: dict, tokens: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.position_type == PositionType.LEARNED:
        # Clamp padded positions into range (their outputs are discarded).
        pos = jnp.minimum(positions, params["pos_embed"].shape[0] - 1)
        x = x + jnp.take(params["pos_embed"], pos, axis=0)
    if cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    return x


def _lm_logits(cfg: ModelConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    x = apply_norm(params["final_norm"], x, cfg.norm_eps)
    if "lm_head" not in params:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype), preferred_element_type=jnp.float32)
    else:
        logits = linear(params["lm_head"], x).astype(jnp.float32)
    if cfg.logits_scaling != 1.0:
        # Reference divides (generic_model.go:473-477).
        logits = logits / cfg.logits_scaling
    return logits.astype(jnp.float32)


def _residual_add(cfg: ModelConfig, x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    if cfg.residual_multiplier != 1.0:
        delta = delta * jnp.asarray(cfg.residual_multiplier, delta.dtype)
    return x + delta


# ---------------------------------------------------------------------------
# Prefill (one sequence, chunked, prefix-cache aware)
# ---------------------------------------------------------------------------


def prefill_chunk(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,        # [T] int32, padded chunk of this sequence
    positions: jnp.ndarray,     # [T] int32 absolute positions (start + i)
    valid_len: jnp.ndarray,     # scalar int32: real chunk length
    context_len: jnp.ndarray,   # scalar int32: prefix_len + valid_len
    block_table: jnp.ndarray,   # [nb] int32 physical blocks covering context
    slot_mapping: jnp.ndarray,  # [T] int32 flat pool slots (OOB => padding)
    pool: dict,
    mamba_state: dict | None = None,
    slot_idx: jnp.ndarray | None = None,  # scalar int32 decode-slot for mamba state
    block_size: int = 16,
    all_logits: bool = False,  # True => return [T, V] (PPL eval harness)
    cp: tuple | None = None,   # (mesh, axis): context-parallel ring attention
    cp_cached_prefix: bool = False,  # CP prompt has a prefix-cache hit: ring
    #   over the suffix + the pool's prefix KV as a chunked flash source
):
    """Runs one prefill chunk; returns (last_token_logits [V], pool, mamba_state).

    Attention strategy: write the chunk's K/V into the paged pool first, then
    gather the whole context window [nb*block_size] back and attend — prefix
    tokens (from prefix-cache hits or earlier chunks) and fresh tokens are
    handled uniformly, and the pool is the single source of truth.

    cp=(mesh, axis): context-parallel prefill (SURVEY §5 long-context stretch
    goal, serving-side). The token dim is sharded over `axis`; attention runs
    as ring attention over the in-flight q/k/v (ops/ring_attention.py) so no
    device ever materializes the full [T, S] score matrix or the full chunk
    KV. Only valid for a FRESH prompt (no cached prefix: the in-flight k/v IS
    the whole context) — the runner gates on num_cached_tokens == 0. KV still
    lands in the paged pool via the same slot-mapping scatter (GSPMD
    reconciles the token-sharded updates), so decode proceeds normally.
    """
    x = _embed(cfg, params, tokens, positions)
    if cp is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from nanovllm_tpu.ops.ring_attention import ring_attention

        cp_mesh, cp_axis = cp
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(cp_mesh, PartitionSpec(cp_axis, None))
        )
    # Real (non-padding) rows — excludes them from MoE capacity dispatch.
    vmask = jnp.arange(tokens.shape[0], dtype=jnp.int32) < valid_len
    S = block_table.shape[0] * block_size
    k_positions = jnp.arange(S, dtype=jnp.int32)
    nslots = pool["k"].shape[0] // cfg.num_layers
    cos_sin = None
    if cfg.position_type == PositionType.ROPE:
        cos_sin = rope_cos_sin(positions, params["rope_inv_freq"])

    def attn_layer(blk, x, pool, layer, use_rope):
        h = apply_norm(blk["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(cfg, blk["attn"], h)
        if cos_sin is not None and use_rope:
            q = apply_rope(q, *cos_sin)
            k = apply_rope(k, *cos_sin)
        pool = kvc.kv_write(pool, layer, nslots, k, v, slot_mapping)
        if cp is not None:
            # Ring attention over the in-flight chunk q/k/v. Padded rows are
            # monotonic-position tail keys: causally visible only to other
            # padded rows. With a cached prefix (VERDICT r4 #9), the in-flight
            # chunk is the SUFFIX; the prefix KV is gathered from the pool
            # (replicated) and flash-accumulated in fixed chunks before the
            # ring — the shared-long-prefix workload no longer falls off the
            # CP cliff to dense prefill.
            if cp_cached_prefix:
                k_pre, v_pre = kvc.kv_gather(
                    pool, layer, nslots, block_table[None, :], block_size,
                    cfg.num_kv_heads, dtype=x.dtype,
                )
                attn = ring_attention(
                    q, k, v, positions, positions, cp_mesh, cp_axis,
                    cfg.attn_scale, cfg.sliding_window,
                    prefix_k=k_pre[0], prefix_v=v_pre[0],
                    prefix_positions=k_positions,
                    prefix_len=context_len - valid_len,
                )
            else:
                attn = ring_attention(
                    q, k, v, positions, positions, cp_mesh, cp_axis,
                    cfg.attn_scale, cfg.sliding_window,
                )
        elif _flash_prefill_ok(S, tokens.shape[0]):
            from nanovllm_tpu.ops.pallas.flash_prefill import flash_prefill_paged

            bt_l = block_table[None, :] + layer * (nslots // block_size)
            attn = flash_prefill_paged(
                q[None], pool["k"], pool["v"], bt_l,
                positions[:1], jnp.reshape(context_len, (1,)),
                cfg.num_kv_heads, block_size, cfg.attn_scale, cfg.sliding_window,
                k_scale_l=pool.get("k_scale"), v_scale_l=pool.get("v_scale"),
            )[0]
        else:
            k_ctx, v_ctx = kvc.kv_gather(
                pool, layer, nslots, block_table[None, :], block_size, cfg.num_kv_heads, dtype=x.dtype
            )
            attn = attention_chunk(
                q, k_ctx[0], v_ctx[0], positions, k_positions, context_len,
                cfg.attn_scale, cfg.sliding_window,
            )
        attn_out = linear(blk["attn"]["o"], attn.reshape(attn.shape[0], -1))
        if cfg.block_style == BlockStyle.PARALLEL:
            # Falcon: x + attn(ln x) + ffn(ln x), single shared LN.
            h2 = h if cfg.parallel_single_ln else apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, attn_out + _ffn_forward(cfg, blk, h2, vmask))
        else:
            x = _residual_add(cfg, x, attn_out)
            h2 = apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h2, vmask))
        return x, pool

    if not isinstance(params["blocks"], list):
        # Homogeneous stack: lax.scan over layer-stacked params with the FULL
        # flat pool in the carry; each layer's write is a scatter at rows
        # offset by the traced layer index (in place — no layer slice/DUS).
        def body(carry, inp):
            x, pool = carry
            blk, i = inp
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, 0))
            return (x, pool), None

        L = cfg.num_layers
        (x, pool), _ = jax.lax.scan(
            body, (x, pool), (params["blocks"], jnp.arange(L, dtype=jnp.int32))
        )
    else:
        for i, blk in enumerate(params["blocks"]):
            if cfg.layer_kind(i) == LayerKind.MAMBA2:
                h = apply_norm(blk["ln1"], x, cfg.norm_eps)
                h, mamba_state = mamba_ops.mamba2_prefill(
                    cfg, blk["mamba"], h, valid_len, mamba_state, i, slot_idx,
                    chunk_start=context_len - valid_len,
                )
                x = _residual_add(cfg, x, h)
                h = apply_norm(blk["ln2"], x, cfg.norm_eps)
                x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h, vmask))
                continue
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, i))

    if all_logits:
        return _lm_logits(cfg, params, x), pool, mamba_state
    last = jnp.take(x, valid_len - 1, axis=0)
    logits = _lm_logits(cfg, params, last[None, :])[0]
    return logits, pool, mamba_state


# ---------------------------------------------------------------------------
# Batched prefill (group of sequences, one dispatch)
# ---------------------------------------------------------------------------


def prefill_batch(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,        # [N, T] int32, padded chunks
    positions: jnp.ndarray,     # [N, T] int32 absolute positions
    valid_lens: jnp.ndarray,    # [N] int32 real chunk lengths
    context_lens: jnp.ndarray,  # [N] int32 total context per sequence
    block_tables: jnp.ndarray,  # [N, nb] int32
    slot_mapping: jnp.ndarray,  # [N*T] int32 flat pool slots (OOB => pad)
    pool: dict,
    block_size: int = 16,
    mamba_state: dict | None = None,
    slot_idxs: jnp.ndarray | None = None,  # [N] int32 decode slots (hybrid)
):
    """Prefill a group of sequences in ONE dispatch; returns (last-token
    logits [N, V], pool, mamba_state). Hybrid (Granite 4.0) groups ride the
    same path: mamba layers run the vmapped SSD core and park all N final
    states with one scatter (padding rows pass OOB slots). The per-sequence
    variant remains for the eval harness and mesh-hybrid fallback."""
    from nanovllm_tpu.ops.attention import attention_chunk_batched

    N, T = tokens.shape
    x = _embed(cfg, params, tokens.reshape(-1), positions.reshape(-1))  # [N*T, E]
    # Real rows per sequence (each row i of seq n is valid iff i < valid_lens[n]).
    vmask = (jnp.arange(T, dtype=jnp.int32)[None, :] < valid_lens[:, None]).reshape(-1)
    S = block_tables.shape[1] * block_size
    k_positions = jnp.arange(S, dtype=jnp.int32)
    nslots = pool["k"].shape[0] // cfg.num_layers
    cos_sin = None
    if cfg.position_type == PositionType.ROPE:
        cos_sin = rope_cos_sin(positions.reshape(-1), params["rope_inv_freq"])

    def attn_layer(blk, x, pool, layer, use_rope=True):
        h = apply_norm(blk["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(cfg, blk["attn"], h)
        if cos_sin is not None and use_rope:
            q = apply_rope(q, *cos_sin)
            k = apply_rope(k, *cos_sin)
        pool = kvc.kv_write(pool, layer, nslots, k, v, slot_mapping)
        if _flash_prefill_ok(S, T):
            from nanovllm_tpu.ops.pallas.flash_prefill import flash_prefill_paged

            bt_l = block_tables + layer * (nslots // block_size)
            attn = flash_prefill_paged(
                q.reshape(N, T, cfg.num_heads, cfg.head_dim),
                pool["k"], pool["v"], bt_l, positions[:, 0], context_lens,
                cfg.num_kv_heads, block_size, cfg.attn_scale, cfg.sliding_window,
                k_scale_l=pool.get("k_scale"), v_scale_l=pool.get("v_scale"),
            ).reshape(N * T, -1)
        else:
            k_ctx, v_ctx = kvc.kv_gather(
                pool, layer, nslots, block_tables, block_size, cfg.num_kv_heads, dtype=x.dtype
            )
            attn = attention_chunk_batched(
                q.reshape(N, T, cfg.num_heads, cfg.head_dim),
                k_ctx, v_ctx, positions, k_positions, context_lens,
                cfg.attn_scale, cfg.sliding_window,
            ).reshape(N * T, -1)
        attn_out = linear(blk["attn"]["o"], attn)
        if cfg.block_style == BlockStyle.PARALLEL:
            h2 = h if cfg.parallel_single_ln else apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, attn_out + _ffn_forward(cfg, blk, h2, vmask))
        else:
            x = _residual_add(cfg, x, attn_out)
            h2 = apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h2, vmask))
        return x, pool

    if not isinstance(params["blocks"], list):
        def body(carry, inp):
            x, pool = carry
            blk, i = inp
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, 0))
            return (x, pool), None

        (x, pool), _ = jax.lax.scan(
            body, (x, pool), (params["blocks"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
        )
    else:
        for i, blk in enumerate(params["blocks"]):
            if cfg.layer_kind(i) == LayerKind.MAMBA2:
                h = apply_norm(blk["ln1"], x, cfg.norm_eps)
                h, mamba_state = mamba_ops.mamba2_prefill_batch(
                    cfg, blk["mamba"], h.reshape(N, T, -1), valid_lens,
                    mamba_state, i, slot_idxs,
                    chunk_starts=context_lens - valid_lens,
                )
                x = _residual_add(cfg, x, h.reshape(N * T, -1))
                h = apply_norm(blk["ln2"], x, cfg.norm_eps)
                x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h, vmask))
                continue
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, i))

    x = x.reshape(N, T, -1)
    last = jnp.take_along_axis(
        x, jnp.maximum(valid_lens - 1, 0)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = _lm_logits(cfg, params, last)
    return logits, pool, mamba_state


# ---------------------------------------------------------------------------
# Decode (fixed-size batch of single-token steps)
# ---------------------------------------------------------------------------


def decode_step(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,        # [B] int32
    positions: jnp.ndarray,     # [B] int32 (= context_len - 1)
    context_lens: jnp.ndarray,  # [B] int32 (>=1; inactive lanes use 1)
    block_tables: jnp.ndarray,  # [B, nb] int32
    slot_mapping: jnp.ndarray,  # [B] int32
    pool: dict,
    mamba_state: dict | None = None,
    block_size: int = 16,
    valid_mask: jnp.ndarray | None = None,  # [B] active lanes
):
    """One batched decode step; returns (logits [B, V], pool, mamba_state)."""
    x = _embed(cfg, params, tokens, positions)  # [B, E]
    vmask = valid_mask
    nslots = pool["k"].shape[0] // cfg.num_layers
    nblocks = nslots // block_size
    cos_sin = None
    if cfg.position_type == PositionType.ROPE:
        cos_sin = rope_cos_sin(positions, params["rope_inv_freq"])

    def attn_layer(blk, x, pool, layer, use_rope):
        h = apply_norm(blk["ln1"], x, cfg.norm_eps)
        B = h.shape[0]
        q, k, v = _qkv(cfg, blk["attn"], h)
        if cos_sin is not None and use_rope:
            q = apply_rope(q, *cos_sin)
            k = apply_rope(k, *cos_sin)
        pool = kvc.kv_write(pool, layer, nslots, k, v, slot_mapping, decode=True)
        if _paged_kernel_ok(block_tables.shape[1] * block_size):
            from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_decode

            # The kernel reads the flat pool directly; rebase this layer's
            # block ids into its row range (pages are data, not layout).
            bt_l = block_tables + layer * nblocks
            attn = paged_attention_decode(
                q, pool["k"], pool["v"], bt_l, context_lens,
                cfg.num_kv_heads, block_size, cfg.attn_scale, cfg.sliding_window,
                k_scale_l=pool.get("k_scale"), v_scale_l=pool.get("v_scale"),
            )
        else:
            k_ctx, v_ctx = kvc.kv_gather(
                pool, layer, nslots, block_tables, block_size, cfg.num_kv_heads, dtype=x.dtype
            )
            attn = attention_decode(q, k_ctx, v_ctx, context_lens, cfg.attn_scale, cfg.sliding_window)
        attn_out = linear(blk["attn"]["o"], attn.reshape(B, -1))
        if cfg.block_style == BlockStyle.PARALLEL:
            h2 = h if cfg.parallel_single_ln else apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, attn_out + _ffn_forward(cfg, blk, h2, vmask))
        else:
            x = _residual_add(cfg, x, attn_out)
            h2 = apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h2, vmask))
        return x, pool

    if not isinstance(params["blocks"], list):
        def body(carry, inp):
            x, pool = carry
            blk, i = inp
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, 0))
            return (x, pool), None

        (x, pool), _ = jax.lax.scan(
            body, (x, pool), (params["blocks"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
        )
    else:
        for i, blk in enumerate(params["blocks"]):
            if cfg.layer_kind(i) == LayerKind.MAMBA2:
                h = apply_norm(blk["ln1"], x, cfg.norm_eps)
                h, mamba_state = mamba_ops.mamba2_decode(cfg, blk["mamba"], h, mamba_state, i, valid_mask=vmask)
                x = _residual_add(cfg, x, h)
                h = apply_norm(blk["ln2"], x, cfg.norm_eps)
                x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h, vmask))
                continue
            x, pool = attn_layer(blk, x, pool, i, _use_rope(cfg, i))

    logits = _lm_logits(cfg, params, x)
    return logits, pool, mamba_state


# ---------------------------------------------------------------------------
# Burst-deferred decode: the whole multi-step burst runs WITHOUT touching the
# pool — each layer's per-step K/V goes into a small VMEM-sized stash, the
# attention scores the (static) pool context plus the stash, and the pool
# receives ONE scatter per burst at flush time. Kills the per-step scatter
# tax (VERDICT r1: XLA's row-serialized KV scatter was ~56% of decode device
# time) and lets the context gather hoist out of the step loop entirely.
# ---------------------------------------------------------------------------


def create_burst_stash(
    cfg: ModelConfig, n_steps: int, B: int, layout: str = "jbhd"
) -> dict:
    """Two carry layouts (per-layer leading dim L in both):

    - "jbhd" (step-major [L, J, B, HD]): the per-step write (.at[layer,
      step]) is a contiguous [B, HD] slab. Fine at <=64 lanes, but at 128
      lanes XLA relayouts the per-layer slice for the stash dots on every
      (layer, step) — ~2.0 ms/step of pure copies at the r5 headline shape.
    - "bhjd" ([L, B, Hkv, J, D]): row-major puts the {J, D} tile minor,
      which is the operand layout BOTH stash dots (QK^T contracting d, PV
      contracting j) consume natively — scan-boundary default layout ==
      dot layout, so no relayout copies. The write is a dim-3 DUS (row j of
      each (b, h) tile); the flush transposes ONCE per burst.

    (A lane-major [L, B, J, HD] carry was also tried for the flush kernel's
    benefit: XLA kept the physical layout step-major anyway and inserted
    per-(layer, step) transpose copies on every read.)"""
    dt = jnp.dtype(cfg.dtype)
    if layout == "bhjd":
        shape = (cfg.num_layers, B, cfg.num_kv_heads, n_steps, cfg.head_dim)
    else:
        shape = (cfg.num_layers, n_steps, B, cfg.num_kv_heads * cfg.head_dim)
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def pregather_context(
    cfg: ModelConfig,
    pool: dict,
    block_tables: jnp.ndarray,  # [B, nb]
    block_size: int,
    use_kernel: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather every attention layer's context KV in one take:
    returns k, v of shape [L, B, S, Hkv, D] (dequantized if INT8 pool), or
    TRANSPOSED [L, B, Hkv, D, S] when use_kernel (the Pallas page-copy kernel
    emits the S-minor layout the per-step dots want; consume with
    attention_decode_stashed(ctx_layout="bhds")). The burst's context is
    static, so this runs once per burst instead of once per (layer, step)."""
    if use_kernel:
        from nanovllm_tpu.ops.pallas import kv_pregather

        assert kv_pregather.pregather_supported(pool), "INT8 pool: XLA path"
        return kv_pregather.pregather_context_pallas(
            pool, block_tables, block_size, cfg.num_layers,
            num_kv_heads=cfg.num_kv_heads, transpose=True,
        )
    L = cfg.num_layers
    bs = block_size
    nslots = pool["k"].shape[0] // L
    B, nb = block_tables.shape
    S = nb * bs
    slots = block_tables[:, :, None] * bs + jnp.arange(bs, dtype=block_tables.dtype)[None, None, :]
    slots = slots.reshape(1, B, S) + (jnp.arange(L, dtype=jnp.int32) * nslots)[:, None, None]
    Hkv, D = cfg.num_kv_heads, cfg.head_dim
    dt = jnp.dtype(cfg.dtype)
    k = jnp.take(pool["k"], slots, axis=0).reshape(L, B, S, Hkv, D)
    v = jnp.take(pool["v"], slots, axis=0).reshape(L, B, S, Hkv, D)
    if pool["k"].dtype == jnp.int8:
        ks = jnp.take(pool["k_scale"], slots, axis=1)  # [Hkv, L, B, S]
        vs = jnp.take(pool["v_scale"], slots, axis=1)
        k = k.astype(jnp.float32) * ks.transpose(1, 2, 3, 0)[..., None]
        v = v.astype(jnp.float32) * vs.transpose(1, 2, 3, 0)[..., None]
    return k.astype(dt), v.astype(dt)


def decode_step_burst(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,        # [B] int32
    positions: jnp.ndarray,     # [B] int32 (= ctx0 - 1 + i for active lanes)
    ctx0: jnp.ndarray,          # [B] int32 context length at burst START
    step_idx,                   # scalar int32 burst step i
    block_tables: jnp.ndarray,  # [B, nb] int32
    pool: dict,                 # READ-ONLY here (pre-burst contents)
    stash: dict,                # carried burst K/V {k, v: [L, n_steps, B, Hkv*D]}
    mamba_state: dict | None = None,
    block_size: int = 16,
    k_ctx_pre: jnp.ndarray | None = None,  # [L, B, S, Hkv, D] hoisted gather
    v_ctx_pre: jnp.ndarray | None = None,  # (or [L, B, Hkv*D, S] transposed)
    valid_mask: jnp.ndarray | None = None,  # [B] active lanes
    ctx_transposed: bool = False,  # k/v_ctx_pre from the pregather kernel
    fused_attn: bool = False,  # Pallas fused attention (bhjd + transposed ctx)
):
    """One decode step of a deferred burst; returns (logits, stash,
    mamba_state). The pool is not written — call flush_burst_stash after the
    burst's last step."""
    from nanovllm_tpu.ops.attention import attention_decode_stashed

    x = _embed(cfg, params, tokens, positions)
    vmask = valid_mask
    nslots = pool["k"].shape[0] // cfg.num_layers
    nblocks = nslots // block_size
    cos_sin = None
    if cfg.position_type == PositionType.ROPE:
        cos_sin = rope_cos_sin(positions, params["rope_inv_freq"])
    fused_masks = None
    if fused_attn and ctx_transposed and k_ctx_pre is not None and stash["k"].ndim == 5:
        # Layer-shared per-step masks for the fused attention kernel.
        from nanovllm_tpu.ops.pallas.fused_decode_attention import decode_masks

        fused_masks = decode_masks(
            ctx0, step_idx, k_ctx_pre.shape[-1], stash["k"].shape[3],
            cfg.sliding_window,
        )
    fused_attn = fused_masks is not None

    def attn_layer(blk, x, stash, layer, use_rope):
        h = apply_norm(blk["ln1"], x, cfg.norm_eps)
        B = h.shape[0]
        q, k, v = _qkv(cfg, blk["attn"], h)
        if cos_sin is not None and use_rope:
            q = apply_rope(q, *cos_sin)
            k = apply_rope(k, *cos_sin)
        dt = stash["k"].dtype
        bhjd = stash["k"].ndim == 5  # [L, B, Hkv, J, D] carry (see create_burst_stash)
        if bhjd:
            # The dim-3 DUS streams the whole per-layer stash buffer per
            # write (~0.69 ms/step at the 128-lane headline shape) — still
            # 3x cheaper than the relayout copies the step-major carry cost
            # there. (A Pallas aliased-block write was tried: XLA copies the
            # full aliased operand around every custom call in the scan
            # body — 1.9 s per 2 bursts, 3x WORSE than the DUS. See
            # docs/PERFORMANCE.md r5 anatomy.)
            stash = {
                "k": stash["k"].at[layer, :, :, step_idx].set(k.astype(dt)),
                "v": stash["v"].at[layer, :, :, step_idx].set(v.astype(dt)),
            }
            J = stash["k"].shape[3]
        else:
            stash = {
                "k": stash["k"].at[layer, step_idx].set(k.reshape(B, -1).astype(dt)),
                "v": stash["v"].at[layer, step_idx].set(v.reshape(B, -1).astype(dt)),
            }
            J = stash["k"].shape[1]
        if (
            not bhjd
            and k_ctx_pre is None
            and J % 8 == 0
            and _paged_kernel_ok(block_tables.shape[1] * block_size)
        ):
            # Long-context stash-aware path (VERDICT r4 #4): the Pallas paged
            # kernel walks this layer's pool pages (ctx0-1 valid rows) AND
            # scores the in-flight burst stash as one extra flash block — so
            # burst-deferred KV writes compose with exact-traffic page DMAs
            # instead of being mutually exclusive.
            from nanovllm_tpu.ops.pallas.paged_attention import paged_attention_decode

            bt_l = block_tables + layer * nblocks
            attn = paged_attention_decode(
                q, pool["k"], pool["v"], bt_l, ctx0 - 1,
                cfg.num_kv_heads, block_size, cfg.attn_scale, cfg.sliding_window,
                k_scale_l=pool.get("k_scale"), v_scale_l=pool.get("v_scale"),
                stash_k=stash["k"][layer], stash_v=stash["v"][layer],
                step_idx=step_idx,
            )
        elif fused_attn and bhjd and ctx_transposed and k_ctx_pre is not None:
            # One Pallas call replaces the whole per-layer attention chain
            # (two QK^T dots, masks, softmax, two PV dots + the scheduling
            # overhead around each) — the op-count tax that dominates the
            # non-matmul step time on the hoisted path (r5 anatomy).
            from nanovllm_tpu.ops.pallas.fused_decode_attention import (
                fused_decode_attention,
            )

            attn = fused_decode_attention(
                q, k_ctx_pre, v_ctx_pre, stash["k"], stash["v"],
                fused_masks[0], fused_masks[1], layer, cfg.attn_scale,
            )
        else:
            layout = "bshd"
            if k_ctx_pre is not None:
                k_ctx, v_ctx = k_ctx_pre[layer], v_ctx_pre[layer]
                if ctx_transposed:
                    # Kernel output is already [B, Hkv, D, S] — consume with
                    # NO reshape (a reshape here defeats XLA's slice fusion
                    # and re-materializes every layer's slice per step).
                    layout = "bhds"
            else:
                k_ctx, v_ctx = kvc.kv_gather(
                    pool, layer, nslots, block_tables, block_size, cfg.num_kv_heads, dtype=x.dtype
                )
            if bhjd:
                sk, sv = stash["k"][layer], stash["v"][layer]  # [B, Hkv, J, D]
            else:
                sk = stash["k"][layer].reshape(J, B, cfg.num_kv_heads, cfg.head_dim)
                sv = stash["v"][layer].reshape(J, B, cfg.num_kv_heads, cfg.head_dim)
            attn = attention_decode_stashed(
                q, k_ctx, v_ctx, sk, sv, ctx0, step_idx, cfg.attn_scale,
                cfg.sliding_window, ctx_layout=layout,
                stash_layout="bhjd" if bhjd else "jbhd",
            )
        attn_out = linear(blk["attn"]["o"], attn.reshape(B, -1))
        if cfg.block_style == BlockStyle.PARALLEL:
            h2 = h if cfg.parallel_single_ln else apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, attn_out + _ffn_forward(cfg, blk, h2, vmask))
        else:
            x = _residual_add(cfg, x, attn_out)
            h2 = apply_norm(blk["ln2"], x, cfg.norm_eps)
            x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h2, vmask))
        return x, stash

    if not isinstance(params["blocks"], list):
        def body(carry, inp):
            x, stash = carry
            blk, i = inp
            x, stash = attn_layer(blk, x, stash, i, _use_rope(cfg, 0))
            return (x, stash), None

        (x, stash), _ = jax.lax.scan(
            body, (x, stash), (params["blocks"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
        )
    else:
        for i, blk in enumerate(params["blocks"]):
            if cfg.layer_kind(i) == LayerKind.MAMBA2:
                h = apply_norm(blk["ln1"], x, cfg.norm_eps)
                h, mamba_state = mamba_ops.mamba2_decode(cfg, blk["mamba"], h, mamba_state, i, valid_mask=vmask)
                x = _residual_add(cfg, x, h)
                h = apply_norm(blk["ln2"], x, cfg.norm_eps)
                x = _residual_add(cfg, x, _ffn_forward(cfg, blk, h, vmask))
                continue
            x, stash = attn_layer(blk, x, stash, i, _use_rope(cfg, i))

    logits = _lm_logits(cfg, params, x)
    return logits, stash, mamba_state


def flush_burst_stash(
    pool: dict,
    cfg: ModelConfig,
    stash: dict,                # {k, v: [L, J, B, Hkv*D]}
    block_tables: jnp.ndarray,  # [B, nb]
    positions0: jnp.ndarray,    # [B] position of the burst's FIRST token
    active: jnp.ndarray,        # [B] bool
    block_size: int,
    max_positions: int = 0,     # >0: drop writes at/past this position
    use_kernel: bool = False,
) -> dict:
    """Write the whole burst's K/V into the pool with ONE scatter per tensor
    (every layer, step and lane at once). With use_kernel (single-chip,
    non-INT8 pools) the scatter runs as the Pallas window-merge kernel —
    XLA lowers the row scatter serialized at ~12.75 ms/burst on the Llama-1B
    bench shape vs ~0.4 ms for the kernel (r5 anatomy,
    docs/PERFORMANCE.md)."""
    bhjd = stash["k"].ndim == 5  # [L, B, Hkv, J, D] carry
    J_steps = stash["k"].shape[3] if bhjd else stash["k"].shape[1]
    if use_kernel:
        from nanovllm_tpu.ops.pallas import kv_flush

        if kv_flush.flush_supported(J_steps, block_size, pool):
            if bhjd:
                # One transpose per BURST to the kernel's lane-major form
                # (vs the per-(layer, step) copies a step-major carry costs
                # during the burst at 128 lanes).
                L, B, Hkv, J, D = stash["k"].shape
                stash = {
                    n: jnp.transpose(s, (0, 1, 3, 2, 4)).reshape(L, B, J, Hkv * D)
                    for n, s in stash.items()
                }
            return kv_flush.flush_burst_stash_pallas(
                pool, stash, block_tables, positions0, active, block_size,
                max_positions or (1 << 30), lane_major=bhjd,
            )
    if bhjd:
        L, B, Hkv, J, D = stash["k"].shape
        stash = {
            n: jnp.transpose(s, (0, 3, 1, 2, 4)).reshape(L, J, B, Hkv * D)
            for n, s in stash.items()
        }
    L, J, B, HD = stash["k"].shape
    bs = block_size
    nslots = pool["k"].shape[0] // L
    total = pool["k"].shape[0]
    pos = positions0[None, :] + jnp.arange(J, dtype=jnp.int32)[:, None]  # [J, B]
    blk = jnp.take_along_axis(block_tables, (pos // bs).T, axis=1).T  # [J, B]
    rows = blk * bs + pos % bs  # per-layer slot ids [J, B]
    keep = active[None, :]
    if max_positions:
        # Positions past the model limit have no allocated block (generation
        # is clamped there) — drop them rather than write via a clamped index.
        keep = keep & (pos < max_positions)
    rows = jnp.where(keep, rows, nslots)
    rows_all = rows[None, :, :] + (jnp.arange(L, dtype=jnp.int32) * nslots)[:, None, None]
    rows_all = jnp.where(rows[None, :, :] >= nslots, total, rows_all).reshape(-1)
    out = dict(pool)
    if pool["k"].dtype == jnp.int8:
        k = stash["k"].reshape(L * J * B, cfg.num_kv_heads, cfg.head_dim)
        v = stash["v"].reshape(L * J * B, cfg.num_kv_heads, cfg.head_dim)
        qk, sk = kvc._quantize_kv(k)
        qv, sv = kvc._quantize_kv(v)
        out["k"] = pool["k"].at[rows_all].set(qk.reshape(-1, HD), mode="drop")
        out["v"] = pool["v"].at[rows_all].set(qv.reshape(-1, HD), mode="drop")
        out["k_scale"] = pool["k_scale"].at[:, rows_all].set(sk.T, mode="drop")
        out["v_scale"] = pool["v_scale"].at[:, rows_all].set(sv.T, mode="drop")
    else:
        dt = pool["k"].dtype
        out["k"] = pool["k"].at[rows_all].set(stash["k"].reshape(-1, HD).astype(dt), mode="drop")
        out["v"] = pool["v"].at[rows_all].set(stash["v"].reshape(-1, HD).astype(dt), mode="drop")
    return out
