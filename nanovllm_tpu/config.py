"""Model and engine configuration.

Capability parity with the reference's two config layers:
  - model config: /root/reference/purego/tensor/config.go:58-122 (`ModelConfig`
    with attention/norm/position/activation/block-style enums, RoPE, MoE,
    Mamba2 and muP fields, per-arch preset constructors :125-376).
  - engine config: /root/reference/nanovllm/config.go:9-70 (batching budgets,
    KV block size/count, validation).

Re-designed TPU-first: dataclasses (hashable, usable as jit static args where
needed), explicit dtype policy (compute dtype vs params dtype), and engine
knobs for shape-stable compilation (max batch slots, prefill bucketing) that a
CPU engine never needed.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass, field


class AttentionType(str, enum.Enum):
    MHA = "mha"  # num_kv_heads == num_heads  (GPT-2)
    GQA = "gqa"  # 1 < num_kv_heads < num_heads  (Llama 3.x, Granite, Mistral)
    MQA = "mqa"  # num_kv_heads == 1  (Falcon-7B)


class NormType(str, enum.Enum):
    LAYERNORM = "layernorm"
    RMSNORM = "rmsnorm"


class PositionType(str, enum.Enum):
    LEARNED = "learned"  # GPT-2 wpe
    ROPE = "rope"


class ActivationType(str, enum.Enum):
    GELU = "gelu"        # tanh-approx GELU (GPT-2, Falcon)
    SWIGLU = "swiglu"    # silu(gate) * up (Llama, Granite, Mistral)


class BlockStyle(str, enum.Enum):
    SEQUENTIAL = "sequential"  # x += attn(ln1 x); x += ffn(ln2 x)
    PARALLEL = "parallel"      # x += attn(ln x) + ffn(ln x)   (Falcon-7B)


class LayerKind(str, enum.Enum):
    """Per-layer kind for hybrid stacks (Granite 4.0: mamba2 + attention)."""

    ATTENTION = "attention"
    MAMBA2 = "mamba2"


@dataclass(frozen=True)
class RopeScalingConfig:
    """Llama-3 style RoPE frequency scaling (capability the reference lacks —
    its RoPE cache simply panics past MaxSeqLen, rope.go:84-86)."""

    rope_type: str = "llama3"
    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclass(frozen=True)
class ModelConfig:
    """Architecture description. Mirrors the capability surface of the
    reference `ModelConfig` (tensor/config.go:58-122) without copying its
    layout; adds dtype policy and sliding-window support."""

    # Core dims
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int = 0  # 0 => hidden_size // num_heads
    intermediate_size: int = 0  # FFN inner dim; 0 => 4*hidden
    max_seq_len: int = 2048

    # Architecture switches
    attention_type: AttentionType = AttentionType.MHA
    norm_type: NormType = NormType.LAYERNORM
    position_type: PositionType = PositionType.ROPE
    activation: ActivationType = ActivationType.SWIGLU
    block_style: BlockStyle = BlockStyle.SEQUENTIAL
    norm_eps: float = 1e-5
    # Per-projection bias flags (GPT-2 has all biases; Llama none; Falcon none
    # on dense layers; Qwen-style attn-bias-only is expressible too).
    attn_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    # Parallel-block variant (Falcon-7B): single shared input layernorm.
    parallel_single_ln: bool = True

    # RoPE
    rope_theta: float = 10000.0
    rope_scaling: RopeScalingConfig | None = None
    partial_rotary_factor: float = 1.0

    # Sliding-window attention (Mistral). 0 = disabled.
    sliding_window: int = 0

    # MoE (Granite 3.0). num_experts == 0 => dense FFN.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    moe_router_renormalize: bool = True
    # Capacity-bounded sorted dispatch (SURVEY §7 hard-part #4): each expert
    # processes at most ceil(T*k/X * factor) tokens; overflow tokens lose that
    # expert's contribution (standard capacity-drop semantics). 0.0 = the
    # dense-combine path (every token through every expert, exact — fine for
    # 8-32 experts). Use >= 1.0 for large expert counts under EP, where dense
    # compute is X/k-fold waste.
    moe_capacity_factor: float = 0.0
    # Dispatch only pays off once the layer is FLOPs-bound: measured on v5e
    # at Granite-MoE-1B shapes (tools/ubench_moe.py), dense wins up to
    # T=256 (weight-stream-bound — all experts are streamed either way,
    # and dispatch adds gather/scatter), dispatch wins from T~1024
    # (447µs vs 622µs at factor 1.0; 2,360µs vs 3,426µs at T=4096). T is
    # static at trace time, so the switch is per-compiled-shape: decode and
    # small prefill ride the exact dense path, large prefill dispatches.
    # NB the 1024 crossover was measured SINGLE-chip, where dense is
    # weight-stream-bound (all experts stream regardless). Under expert
    # parallelism that argument collapses — expert weights are sharded, and
    # dense compute is X/k-fold waste at every T — so EP deployments should
    # set this to 1 (and size moe_capacity_factor from measured drop rates,
    # ops/moe.py moe_dispatch_drop_stats).
    moe_dispatch_min_tokens: int = 1024

    # muP multipliers (Granite; reference generic_model.go:298-301,320-325,
    # 473-477 — NB logits are *divided* by logits_scaling).
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: float = 0.0  # 0 => 1/sqrt(head_dim)
    logits_scaling: float = 1.0

    # Mamba2 / hybrid (Granite 4.0). Empty layer_kinds => all-attention.
    layer_kinds: tuple[LayerKind, ...] = ()
    mamba_d_state: int = 0
    mamba_d_conv: int = 0
    mamba_n_heads: int = 0
    mamba_head_dim: int = 0
    mamba_expand: int = 2
    mamba_n_groups: int = 1
    mamba_chunk_size: int = 256
    # Granite 4.0 attention layers have no RoPE (nope); default True for
    # ordinary rope models.
    hybrid_attn_rope: bool = True

    # Dtype policy: name strings to stay hashable ("bfloat16"/"float32").
    dtype: str = "bfloat16"

    # Identification
    model_type: str = "llama"
    eos_token_id: int | tuple[int, ...] = 2
    bos_token_id: int | None = None

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim", self.hidden_size // self.num_heads)
        if self.intermediate_size == 0:
            object.__setattr__(self, "intermediate_size", 4 * self.hidden_size)
        if self.num_heads % max(self.num_kv_heads, 1) != 0 and self.num_kv_heads > 1:
            raise ValueError(
                f"num_heads={self.num_heads} not divisible by num_kv_heads={self.num_kv_heads}"
            )
        # Derive attention type if the default doesn't match head counts.
        if self.num_kv_heads == 1 and self.num_heads > 1:
            object.__setattr__(self, "attention_type", AttentionType.MQA)
        elif self.num_kv_heads == self.num_heads:
            object.__setattr__(self, "attention_type", AttentionType.MHA)
        else:
            object.__setattr__(self, "attention_type", AttentionType.GQA)

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def attn_scale(self) -> float:
        """Softmax scale; Granite overrides with muP attention_multiplier
        (reference attention.go:360-364)."""
        if self.attention_multiplier:
            return self.attention_multiplier
        return 1.0 / math.sqrt(self.head_dim)

    @property
    def is_hybrid(self) -> bool:
        return any(k == LayerKind.MAMBA2 for k in self.layer_kinds)

    def layer_kind(self, i: int) -> LayerKind:
        if not self.layer_kinds:
            return LayerKind.ATTENTION
        return self.layer_kinds[i]

    @property
    def eos_token_ids(self) -> tuple[int, ...]:
        if isinstance(self.eos_token_id, tuple):
            return self.eos_token_id
        return (self.eos_token_id,)

    def num_params_estimate(self) -> int:
        """Rough parameter count (capability parity with
        tensor/config.go:421 EstimateParameters)."""
        e, v, l = self.hidden_size, self.vocab_size, self.num_layers
        d = self.head_dim
        attn = e * (self.num_heads * d) + 2 * e * (self.num_kv_heads * d) + (self.num_heads * d) * e
        if self.num_experts:
            ffn = self.num_experts * 3 * e * self.moe_intermediate_size + e * self.num_experts
        else:
            mult = 3 if self.activation == ActivationType.SWIGLU else 2
            ffn = mult * e * self.intermediate_size
        emb = v * e * (1 if self.tie_word_embeddings else 2)
        return emb + l * (attn + ffn)


@dataclass(frozen=True)
class EngineConfig:
    """Serving-engine knobs. Mirrors the reference's engine config
    (nanovllm/config.go:9-20 — MaxNumBatchedTokens 16384, MaxNumSeqs 512,
    MaxModelLen 4096, KVCacheBlockSize, NumKVCacheBlocks) and adds the
    TPU-specific shape-stability knobs the reference never needed."""

    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 256
    max_model_len: int = 4096
    kv_block_size: int = 128
    num_kv_blocks: int = -1  # -1 => sized from kv_pool_bytes at runtime
    kv_pool_bytes: int = 4 << 30  # HBM budget for the paged KV pool
    eos_token_id: int = -1
    enable_prefix_caching: bool = True

    # TPU shape discipline: decode runs at a fixed batch of `max_decode_slots`
    # (padded with inactive lanes); prefill lengths are bucketed to powers of
    # two between min_prefill_bucket and max_model_len to bound recompiles.
    max_decode_slots: int = 64
    min_prefill_bucket: int = 128
    # Decode steps executed per device dispatch (multi-step decode): sampled
    # tokens feed the next step on device via lax.scan, amortizing host
    # round-trips. Sequences may overshoot EOS by < decode_burst tokens
    # (trimmed at postprocess) — the standard multi-step scheduling tradeoff.
    decode_burst: int = 8
    # Burst-deferred KV writes: the whole decode burst runs without touching
    # the pool (per-step K/V stashed in a small carried buffer, attention
    # scores pool-context + stash), then ONE scatter per burst at flush. Kills
    # the per-step scatter that dominated decode device time (~56%, VERDICT
    # r1). Tri-state: None = auto (on whenever the XLA-gather attention path
    # would be used, i.e. short/medium context windows; the paged Pallas
    # kernel path keeps per-step writes since the kernel reads the pool),
    # True/False force. Env override: NANOVLLM_DEFER_KV=0/1.
    deferred_kv_writes: bool | None = None
    # Clamp each decode dispatch's step count at the largest remaining
    # token budget (max_tokens / max_model_len) across its lanes, bucketed
    # to a power of two: short completions (max_tokens < decode_burst, or a
    # final sub-burst tail) stop paying for full-burst device work whose
    # sampled tokens postprocess would discard. Program count grows by at
    # most log2(decode_burst) extra (nb, n_steps) decode variants; in
    # steady serving only one or two get used.
    clamp_burst_to_budget: bool = True
    # lax.scan over layers (one compiled layer body). Cuts compile/program
    # size for deep models but costs ~25-35% decode throughput (measured on
    # Llama-1B: scan variants 2.2-2.6k tok/s vs 3.4k unrolled) — XLA
    # schedules the unrolled layers better. Off by default.
    scan_layers: bool = False
    # Fuse q/k/v projections into one matmul at load (one quant-kernel
    # dispatch instead of three per layer; numerics-identical — per-column
    # scales). Tri-state: None = auto (on unless sharded: TP splits q/k/v
    # over heads separately), True/False force.
    fuse_qkv: bool | None = None
    # KV cache quantization: "none" | "int8"
    kv_cache_dtype: str = "none"
    # Weight quantization: "none" | "int8" | "int4"
    quantization: str = "none"

    # Failure recovery (SURVEY §5): a failed device step requeues its
    # sequences (they re-prefill from the pool-backed prefix) up to this many
    # times each before the request finishes with finish_reason="error";
    # after `max_consecutive_step_failures` failed steps in a row the engine
    # re-raises (the device is gone, not the request).
    max_retries_per_request: int = 2
    max_consecutive_step_failures: int = 8

    # Parallelism
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # Context parallelism (sequence-parallel prefill): long fresh prompts are
    # prefilled with the token dim sharded over a mesh axis and ring
    # attention (ops/ring_attention.py) rotating KV shards over ICI — peak
    # per-device score memory drops from O(T*S) to O((T/P)^2), so one prompt
    # can exceed a single chip's attention budget. The CP axis is 'data'
    # when data_parallel_size > 1 (weights replicated over it — the clean
    # case); on a tp-only mesh it falls back to 'model' (GSPMD adds
    # per-layer weight/activation collectives — bandwidth for memory).
    # GATES (runner._cp_applies): hybrid (Mamba2) models are excluded
    # (sequential state scan); the padded SUFFIX (prompt minus any cached
    # prefix) must be >= cp_min_tokens and divisible by the CP axis size;
    # mid-chunk-train admissions are excluded (the in-flight chunk must BE
    # the whole suffix). Prefix-cache hits STAY on CP (r5): the suffix
    # ring-attends while the prefix KV pages in from the pool as a chunked
    # flash source (ops/ring_attention.py prefix operands).
    context_parallel: bool = False
    cp_min_tokens: int = 1024
    # Chunked prefill (scheduler policy): admit long prompts in chunks of at
    # most this many tokens per engine step instead of whole-prompt, so one
    # near-max_model_len prompt neither compiles the largest prefill bucket
    # nor monopolizes steps — short requests admit alongside each chunk and
    # running decodes alternate with the chunk train. 0 = off (whole-prompt
    # admission, the reference's behavior). Chunk boundaries are aligned down
    # to kv_block_size (prefill resume offsets stay on the block-aligned
    # path prefix caching already exercises). Not applicable to hybrid
    # (Mamba2) models — their prefill scan cannot resume mid-prompt — the
    # LLM facade zeroes it there, like enable_prefix_caching.
    prefill_chunk_tokens: int = 0
    # Pad every batched-prefill dispatch (and the prefill sampling batch) to
    # ONE fixed shape per (Tb, nb) bucket instead of power-of-two batch
    # buckets. Costs padded compute on small groups but collapses the
    # serving-path program count — decisive when the device's executable
    # cache is small (the tunneled dev chip reloads an evicted program in
    # 15-30 s(!); measured r4, docs/PERFORMANCE.md serving notes). Off by
    # default: direct-attached TPUs switch programs cheaply.
    prefill_fixed_groups: bool = False

    def __post_init__(self):
        if self.kv_block_size % 16 != 0:
            raise ValueError("kv_block_size must be a multiple of 16")
        if self.max_num_seqs <= 0 or self.max_model_len <= 0:
            raise ValueError("max_num_seqs and max_model_len must be positive")
        if self.max_num_batched_tokens < self.max_model_len:
            raise ValueError(
                "max_num_batched_tokens must be >= max_model_len "
                f"({self.max_num_batched_tokens} < {self.max_model_len})"
            )
        if self.kv_cache_dtype not in ("none", "int8"):
            raise ValueError(f"unsupported kv_cache_dtype {self.kv_cache_dtype}")
        if self.quantization not in ("none", "int8", "int4"):
            raise ValueError(f"unsupported quantization {self.quantization}")
        if not 1 <= self.tensor_parallel_size <= 256:
            raise ValueError("tensor_parallel_size out of range")
        if self.data_parallel_size > 1 and self.max_decode_slots % self.data_parallel_size != 0:
            raise ValueError(
                "max_decode_slots must be divisible by data_parallel_size "
                f"({self.max_decode_slots} % {self.data_parallel_size})"
            )
        if self.prefill_chunk_tokens and self.prefill_chunk_tokens < self.kv_block_size:
            raise ValueError(
                "prefill_chunk_tokens must be 0 (off) or >= kv_block_size "
                f"({self.prefill_chunk_tokens} < {self.kv_block_size})"
            )

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)


def bucket_length(n: int, minimum: int, maximum: int) -> int:
    """Round n up to the next power-of-two bucket in [minimum, maximum]."""
    b = max(minimum, 1)
    while b < n:
        b *= 2
    return min(b, maximum) if b <= maximum else maximum
