"""Model runners: the scheduler↔device seam.

Capability parity with /root/reference/nanovllm/model_runner.go (the
`ModelRunner` interface + `MockModelRunner` test fake) and
tensor_model_runner.go (the real bridge). The decisive differences from the
reference (SURVEY.md §2.5-1/2):

  - decode is ONE batched jitted step over all running sequences (the
    reference loops sequences serially with batch=1);
  - block tables index the physical paged KV pool on device;
  - prefix-cache hits SKIP compute: prefill starts at num_cached_tokens;
  - sampling runs on device, batched, with per-lane parameters.

Shape discipline: decode always runs at [max_decode_slots] lanes; prefill
chunk lengths and block-table widths are bucketed to powers of two, and each
(bucket) shape is compiled once and cached. The KV pool (and Mamba state) is
donated through every step, so it is updated in place in HBM.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import EngineConfig, ModelConfig, bucket_length
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.ops import mamba2 as mamba_ops
from nanovllm_tpu.ops import sampling as sampling_ops


class ModelRunner(Protocol):
    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[list[int]]:
        """Returns one token burst per sequence (prefill bursts have length
        1; decode bursts have up to decode_burst tokens)."""
        ...

    def close(self) -> None: ...


class MockModelRunner:
    """Deterministic model-free runner for engine tests (reference
    model_runner.go:19-50: deterministic tokens + periodic EOS)."""

    def __init__(self, eos_token_id: int = 0, eos_every: int = 10, burst: int = 1):
        self.eos_token_id = eos_token_id
        self.eos_every = eos_every
        self.burst = burst

    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[list[int]]:
        out = []
        n_steps = 1 if is_prefill else self.burst
        for seq in seqs:
            if is_prefill and not (
                seq.prefill_target is None or seq.prefill_target >= len(seq)
            ):
                out.append([])  # mid-prefill chunk: no token sampled yet
                continue
            toks = []
            for i in range(n_steps):
                n = seq.num_completion_tokens + i
                if n > 0 and (n + 1) % self.eos_every == 0:
                    toks.append(self.eos_token_id)
                else:
                    # Keyed off prompt content (not seq id) so re-runs and
                    # burst sizes are reproducible.
                    toks.append(1 + (seq.token_ids[0] + n) % 97)
            out.append(toks)
        return out

    def close(self) -> None:
        pass


def _chunk_bounds(seq: Sequence) -> tuple[int, int]:
    """[start, end) of this step's prefill chunk. Whole remaining prompt when
    the scheduler didn't set a chunk target (non-chunked admission)."""
    start = max(seq.num_prefilled_tokens, seq.num_cached_tokens)
    end = seq.prefill_target if seq.prefill_target is not None else len(seq)
    return start, end


def _is_final_chunk(seq: Sequence) -> bool:
    return seq.prefill_target is None or seq.prefill_target >= len(seq)


def default_num_kv_blocks(mcfg: ModelConfig, ecfg: EngineConfig) -> int:
    if ecfg.num_kv_blocks > 0:
        return ecfg.num_kv_blocks
    quant = ecfg.kv_cache_dtype == "int8"
    n_attn = sum(
        1 for i in range(mcfg.num_layers) if mcfg.layer_kind(i).value == "attention"
    )
    itemsize = (1 + 4.0 / mcfg.head_dim) if quant else jnp.dtype(mcfg.dtype).itemsize
    bytes_per_block = int(
        2 * max(n_attn, 1) * ecfg.kv_block_size * mcfg.num_kv_heads * mcfg.head_dim * itemsize
    )
    n = max(ecfg.kv_pool_bytes // bytes_per_block, 4)
    # No point holding more blocks than every decode slot at full context can
    # address (tiny test models would otherwise get multi-GB pools).
    blocks_per_seq = math.ceil(ecfg.max_model_len / ecfg.kv_block_size)
    n = min(n, ecfg.max_decode_slots * blocks_per_seq + 1)
    # At minimum, enough blocks for one full-length sequence plus slack.
    n = max(n, 2 * blocks_per_seq)
    # +1 for reserved physical block 0 (BlockManager never allocates it; the
    # Pallas flush kernel uses it as the inactive-lane dustbin window).
    return int(n) + 1


class TPUModelRunner:
    """Runs the jitted prefill/decode/sample programs against the paged pool."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig,
        params: Optional[dict] = None,
        num_kv_blocks: Optional[int] = None,
        mesh=None,
        params_global: bool = False,
    ):
        self.mcfg = model_cfg
        self.ecfg = engine_cfg
        self.mesh = mesh
        self.params = params if params is not None else M.init_params(model_cfg)
        if mesh is None and engine_cfg.quantization in ("int4", "int8"):
            # Single-chip quantized: permute weights to the tiled HBM layout
            # so every kernel grid block is one contiguous DMA run (~6%
            # faster modeled decode step, ops/quant.py tile_quant). Must
            # precede stack_blocks (the scan slices per-layer leaves of the
            # stacked tiled arrays).
            self.params = M.tile_quant_params(self.params)
        if engine_cfg.scan_layers and not model_cfg.is_hybrid and not params_global:
            # Layer-stacked params => scan-over-layers forward (compiles the
            # layer body once instead of num_layers inlined copies; trades
            # ~30% decode throughput — see EngineConfig.scan_layers).
            self.params = M.stack_blocks(self.params)
        if mesh is not None and not params_global:
            # params_global: already assembled as global sharded jax.Arrays
            # by io/shard_loader (per-host shard reading) — nothing to place.
            from nanovllm_tpu.parallel import shard_params

            self.params = shard_params(self.params, model_cfg, mesh)
        self.num_kv_blocks = num_kv_blocks or default_num_kv_blocks(model_cfg, engine_cfg)
        bs = engine_cfg.kv_block_size
        self.block_size = bs
        self.num_slots_flat = self.num_kv_blocks * bs
        S = engine_cfg.max_decode_slots
        self.S = S

        self.pool = kvc.create_kv_pool(
            model_cfg.num_layers,
            self.num_kv_blocks,
            bs,
            model_cfg.num_kv_heads,
            model_cfg.head_dim,
            dtype=jnp.dtype(model_cfg.dtype),
            quantized=engine_cfg.kv_cache_dtype == "int8",
        )
        if mesh is not None:
            from jax.sharding import NamedSharding
            from nanovllm_tpu.parallel import shard_pool
            from nanovllm_tpu.parallel.shardings import pool_specs

            self.pool = shard_pool(self.pool, model_cfg, mesh)
            # Output-sharding anchors for the jitted steps: the pool must
            # come back exactly as placed (model-axis sharded, replicated
            # over 'data') so donation round-trips without resharding.
            self._pool_sh = {
                k: NamedSharding(mesh, v)
                for k, v in pool_specs(
                    model_cfg, mesh, engine_cfg.kv_cache_dtype == "int8"
                ).items()
            }
        else:
            self._pool_sh = None
        self.mamba_state = (
            mamba_ops.create_mamba_state(model_cfg, S) if model_cfg.is_hybrid else None
        )
        if mesh is not None and self.mamba_state is not None:
            from nanovllm_tpu.parallel import shard_mamba_state

            self.mamba_state = shard_mamba_state(self.mamba_state, mesh)

        # On-device sampling state, one row per decode slot. Device arrays are
        # authoritative inside the fused decode step; host mirrors exist so
        # prefill-time batched sampling can slice per-slot params cheaply.
        L = engine_cfg.max_model_len + 8
        self.hist_capacity = L
        self.history = jnp.full((S, L), model_cfg.vocab_size, jnp.int32)
        self.h_temps = np.ones((S,), np.float32)
        self.h_topks = np.zeros((S,), np.int32)
        self.h_topps = np.ones((S,), np.float32)
        self.h_reps = np.ones((S,), np.float32)
        self.h_seeds = np.zeros((S,), np.uint32)
        self.h_hist_lens = np.zeros((S,), np.int32)
        self.d_sampling = {
            "temps": jnp.ones((S,), jnp.float32),
            "topks": jnp.zeros((S,), jnp.int32),
            "topps": jnp.ones((S,), jnp.float32),
            "reps": jnp.ones((S,), jnp.float32),
            "seeds": jnp.zeros((S,), jnp.uint32),
            "hist_lens": jnp.zeros((S,), jnp.int32),
        }
        self.step_counter = 0

        # Under a mesh, every step input becomes a GLOBAL array (device_put
        # with a NamedSharding spanning the mesh) — required for
        # multi-controller SPMD. Scalars/small tables are replicated; the
        # decode-lane dimension [S] is SHARDED over the mesh 'data' axis when
        # data_parallel_size > 1, so each DP replica computes only its own
        # S/dp lanes (real data parallelism — the capability the reference's
        # dead TensorParallelSize field only pretended to have,
        # /root/reference/nanovllm/config.go:15). Persistent per-lane device
        # state (history, sampling rows) is placed lane-sharded once at init.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from nanovllm_tpu.parallel.mesh import DATA_AXIS

            self._rep = NamedSharding(mesh, PartitionSpec())
            dp = dict(mesh.shape).get(DATA_AXIS, 1)
            self._dp = dp
            if dp > 1 and S % dp == 0:
                self._lane = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
                self._lane2 = NamedSharding(mesh, PartitionSpec(DATA_AXIS, None))
                # Decode-time sampling runs UNDER shard_map over 'data': each
                # replica samples only its own lanes. Without this, GSPMD's
                # scatter partitioner lowers the repetition-penalty
                # count-scatter as replicate+all-reduce of the full [B, V]
                # logits — a per-step collective that scales with vocab.
                d = PartitionSpec(DATA_AXIS)
                d2 = PartitionSpec(DATA_AXIS, None)
                self._sample_op = jax.shard_map(
                    sampling_ops.sample, mesh=mesh,
                    in_specs=(d2, d2, d, d, d, d, d, d, PartitionSpec()),
                    out_specs=d, check_vma=False,
                )
            else:
                self._lane = self._lane2 = self._rep
                self._sample_op = sampling_ops.sample
            self.history = jax.device_put(self.history, self._lane2)
            self.d_sampling = {
                k: jax.device_put(v, self._lane) for k, v in self.d_sampling.items()
            }
        else:
            self._rep = None
            self._lane = self._lane2 = None
            self._dp = 1
            self._sample_op = sampling_ops.sample

        # Context-parallel prefill axis: 'data' when dp>1 (weights are
        # replicated over it — the clean CP axis); otherwise fall back to
        # 'model' on tp-only meshes (VERDICT r3 #6 — the common single-host
        # Falcon config). On the model axis the weights stay TP-sharded while
        # the token dim shards over the same axis; GSPMD inserts the
        # per-layer weight/activation collectives, trading bandwidth for the
        # O((T/P)^2) score-memory ceiling ring attention provides.
        self._cp_axis = None
        self._cp_size = 1
        self._cp_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from nanovllm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            shape = dict(mesh.shape)
            if shape.get(DATA_AXIS, 1) > 1:
                self._cp_axis, self._cp_size = DATA_AXIS, shape[DATA_AXIS]
            elif shape.get(MODEL_AXIS, 1) > 1:
                self._cp_axis, self._cp_size = MODEL_AXIS, shape[MODEL_AXIS]
            if self._cp_axis is not None:
                self._cp_sh = NamedSharding(mesh, PartitionSpec(self._cp_axis))

        self.max_blocks_per_seq = math.ceil(engine_cfg.max_model_len / bs)
        self._prefill_cache: dict = {}
        self._decode_cache: dict = {}
        if self._rep is not None:
            rep = self._rep

            def _sample_rep(*a):
                return jax.lax.with_sharding_constraint(sampling_ops.sample(*a), rep)

            self._sample_fn = jax.jit(_sample_rep)
        else:
            self._sample_fn = jax.jit(sampling_ops.sample)

    def _dev(self, x, sharding=None):
        """Host value -> device array (global when on a mesh; `sharding`
        overrides the default replicated placement, e.g. lane-sharded)."""
        if self._rep is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), sharding or self._rep)

    # ---- compiled-program factories -------------------------------------

    def _get_prefill(self, T: int, nb: int):
        key = (T, nb)
        if key not in self._prefill_cache:
            cfg = self.mcfg

            bs = self.ecfg.kv_block_size

            def fn(params, tokens, positions, valid_len, context_len, block_table, slot_mapping, pool, mamba_state, slot_idx):
                return M.prefill_chunk(
                    params, cfg, tokens, positions, valid_len, context_len,
                    block_table, slot_mapping, pool, mamba_state, slot_idx, bs,
                )

            self._prefill_cache[key] = jax.jit(fn, donate_argnums=(7, 8))
        return self._prefill_cache[key]

    def _get_prefill_cp(self, T: int, nb: int, has_prefix: bool = False):
        """Context-parallel prefill program: token dim sharded over the CP
        axis ('data' when dp>1, else 'model' on tp-only meshes), ring
        attention over the in-flight chunk (see M.prefill_chunk cp=). One
        compiled program per (T, nb, has_prefix) bucket; has_prefix adds the
        pool-prefix flash source (prefix-cached prompts stay on CP)."""
        key = ("cp", self._cp_axis, T, nb, has_prefix)
        if key not in self._prefill_cache:
            cfg = self.mcfg
            bs = self.ecfg.kv_block_size
            mesh = self.mesh
            rep, pool_sh = self._rep, self._pool_sh
            cp_axis = self._cp_axis

            def fn(params, tokens, positions, valid_len, context_len, block_table, slot_mapping, pool, mamba_state, slot_idx):
                logits, pool, ms = M.prefill_chunk(
                    params, cfg, tokens, positions, valid_len, context_len,
                    block_table, slot_mapping, pool, mamba_state, slot_idx, bs,
                    cp=(mesh, cp_axis), cp_cached_prefix=has_prefix,
                )
                logits = jax.lax.with_sharding_constraint(logits, rep)
                pool = {
                    k: jax.lax.with_sharding_constraint(v, pool_sh[k])
                    for k, v in pool.items()
                }
                return logits, pool, ms

            self._prefill_cache[key] = jax.jit(fn, donate_argnums=(7, 8))
        return self._prefill_cache[key]

    def _get_decode(self, nb: int, n_steps: int):
        """Fused multi-step decode: `n_steps` iterations of (model forward +
        batched sampling + history append + on-device state advance) under one
        lax.scan in ONE dispatch — sampled tokens feed the next step on
        device. Amortizes host round-trip latency (measured ~29ms through the
        device tunnel) and per-step host work across the whole burst."""
        key = (nb, n_steps)
        if key not in self._decode_cache:
            cfg = self.mcfg
            bs = self.ecfg.kv_block_size
            Lh = self.hist_capacity
            rep = self._rep
            lane, lane2, pool_sh = self._lane, self._lane2, self._pool_sh
            sample_op = self._sample_op
            max_len = self.ecfg.max_model_len

            nslots = self.num_slots_flat

            def fn(params, tokens0, positions0, context_lens0, active, block_tables,
                   pool, mamba_state, history, sampling, step0):
                Sn = tokens0.shape[0]
                lanes = jnp.arange(Sn)

                def body(carry, i):
                    tokens, positions, ctx, pool, mamba, history, hist_lens = carry
                    blk = jnp.take_along_axis(
                        block_tables, (positions // bs)[:, None], axis=1
                    )[:, 0]
                    # Positions at/past max_model_len have no allocated block
                    # (generation is clamped there): drop their writes instead
                    # of letting the clamped table index corrupt block 0.
                    slot_mapping = jnp.where(
                        active & (positions < max_len), blk * bs + positions % bs, nslots
                    ).astype(jnp.int32)
                    logits, pool, mamba = M.decode_step(
                        params, cfg, tokens, positions, ctx, block_tables,
                        slot_mapping, pool, mamba, bs, valid_mask=active,
                    )
                    sampled = sample_op(
                        logits.astype(jnp.float32), history, hist_lens,
                        sampling["temps"], sampling["topks"], sampling["topps"],
                        sampling["reps"], sampling["seeds"], step0 + i,
                    )
                    row = jnp.where(active, hist_lens, Lh)
                    history = history.at[lanes, row].set(sampled, mode="drop")
                    inc = active.astype(jnp.int32)
                    carry = (
                        sampled, positions + inc, ctx + inc, pool, mamba,
                        history, hist_lens + inc,
                    )
                    return carry, sampled

                init = (
                    tokens0, positions0, context_lens0, pool, mamba_state,
                    history, sampling["hist_lens"],
                )
                (tok, pos, ctx, pool, mamba_state, history, hist_lens), ys = jax.lax.scan(
                    body, init, jnp.arange(n_steps, dtype=jnp.int32)
                )
                sampling_out = dict(sampling)
                sampling_out["hist_lens"] = hist_lens
                if rep is not None:
                    # Multi-controller: sampled tokens must be fully
                    # replicated so every process can device_get them.
                    ys = jax.lax.with_sharding_constraint(ys, rep)
                if lane is not None and lane is not rep:
                    # DP: per-lane state stays lane-sharded; the pool stays
                    # as placed (replicated over 'data') so each replica's
                    # KV writes are reconciled by an all-gather of the
                    # (small) updates, not a resharding of the pool.
                    history = jax.lax.with_sharding_constraint(history, lane2)
                    sampling_out = {
                        k: jax.lax.with_sharding_constraint(v, lane)
                        for k, v in sampling_out.items()
                    }
                    pool = {
                        k: jax.lax.with_sharding_constraint(v, pool_sh[k])
                        for k, v in pool.items()
                    }
                return ys, pool, mamba_state, history, sampling_out

            self._decode_cache[key] = jax.jit(fn, donate_argnums=(6, 7, 8, 9))
        return self._decode_cache[key]

    # Pregathering every layer's context once per burst (instead of per step)
    # amortizes the page gather + INT8 dequant across the burst, at the cost
    # of holding [L, B, S, Hkv, D] x2 live in HBM. Auto-capped by size.
    # Measured (Llama-1B bench, 32 lanes, burst 16): per-step 4,265 tok/s;
    # deferred WITHOUT pregather 4,017 (regression — per-step gathers inside
    # the burst plus stash scoring lose); deferred WITH pregather 6,388.
    # Hence auto-defer requires the pregather to fit the cap. r5: cap raised
    # 1 GB -> 2.25 GB — Mistral-7B shapes at 32 lanes (1.07 GB) fell off the
    # deferred path onto per-step scatters and measured 0.138 of their
    # weight-stream bound; 2.25 GB also covers 128-lane Llama-1B (2.1 GB).
    # Past the cap, short contexts take per-step decode and long contexts
    # ride the stash-aware paged kernel (no pregather needed).
    PREGATHER_BYTE_CAP = int(2.25 * (1 << 30))

    def _pregather_fits(self, nb: int) -> bool:
        import os

        if os.environ.get("NANOVLLM_PREGATHER") in ("0", "1"):
            return os.environ["NANOVLLM_PREGATHER"] == "1"
        cfg = self.mcfg
        pregather_bytes = (
            2 * cfg.num_layers * self.S * nb * self.block_size
            * cfg.num_kv_heads * cfg.head_dim * jnp.dtype(cfg.dtype).itemsize
        )
        return pregather_bytes <= self.PREGATHER_BYTE_CAP

    def _get_decode_burst(self, nb: int, n_steps: int):
        """Burst-deferred decode: n_steps of (forward + sampling) under one
        lax.scan with the pool READ-ONLY — per-step K/V goes to a stash scored
        alongside the pool context, and the pool takes ONE scatter at flush
        (vs num_layers * n_steps row-serialized scatters per burst)."""
        cfg = self.mcfg
        bs = self.ecfg.kv_block_size
        # The stash-aware paged kernel reads pool pages directly — no
        # pregather on the long-context path.
        hoist = (
            not M._paged_kernel_ok(nb * bs) and self._pregather_fits(nb)
        )
        # Pallas window-merge flush (single-chip, non-INT8 pools): replaces
        # the row-serialized XLA scatter (~12.75 ms/burst -> ~0.4 ms at the
        # bench shape). NANOVLLM_FLUSH_KERNEL=0/1 overrides for A/B.
        import os as _os

        flush_kernel = (
            self.mesh is None
            and self.ecfg.kv_cache_dtype != "int8"
            and jax.default_backend() == "tpu"
        )
        # Same conditions gate the Pallas pregather (page-copy, S-minor
        # output — replaces the ~73 GB/s row gather + two full-size layout
        # copies). NANOVLLM_PREGATHER_KERNEL=0/1 overrides for A/B.
        pregather_kernel = flush_kernel and hoist
        if _os.environ.get("NANOVLLM_FLUSH_KERNEL") in ("0", "1"):
            flush_kernel = _os.environ["NANOVLLM_FLUSH_KERNEL"] == "1"
        if _os.environ.get("NANOVLLM_PREGATHER_KERNEL") in ("0", "1"):
            pregather_kernel = (
                hoist and _os.environ["NANOVLLM_PREGATHER_KERNEL"] == "1"
            )
        # Fused Pallas attention (one call per layer-step replacing the XLA
        # attention op chain) rides the pregather kernel's transposed output
        # and the bhjd stash carry. NANOVLLM_FUSED_ATTN=0/1 overrides.
        fused_attn = False
        if pregather_kernel:
            from nanovllm_tpu.ops.pallas import fused_decode_attention as _fa

            fused_attn = _fa.fused_supported(
                self.S, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                nb * bs, n_steps,
            )
        if _os.environ.get("NANOVLLM_FUSED_ATTN") in ("0", "1"):
            fused_attn = fused_attn and _os.environ["NANOVLLM_FUSED_ATTN"] == "1"
        # Stash carry layout: [L, B, Hkv, J, D] ("bhjd") whenever the fused
        # kernel consumes it, and on the hoisted path at wide batches — its
        # row-major layout is what both stash dots consume, killing the
        # per-(layer, step) relayout copies XLA inserts at 128 lanes (~2.0
        # ms/step at the r5 headline shape; <=64-lane XLA programs never
        # paid them, so without the fused kernel they keep the step-major
        # carry whose write is free). The stash-aware paged kernel
        # (non-hoist long-context path) consumes step-major directly.
        # NANOVLLM_STASH_LAYOUT overrides for A/B.
        stash_layout = "bhjd" if (fused_attn or (hoist and self.S >= 96)) else "jbhd"
        if _os.environ.get("NANOVLLM_STASH_LAYOUT") in ("bhjd", "jbhd"):
            stash_layout = _os.environ["NANOVLLM_STASH_LAYOUT"]
            if not hoist:
                stash_layout = "jbhd"  # kernel path needs step-major
        fused_attn = fused_attn and stash_layout == "bhjd"
        key = ("burst", nb, n_steps, hoist, flush_kernel, pregather_kernel,
               stash_layout, fused_attn)
        if key not in self._decode_cache:
            Lh = self.hist_capacity
            rep = self._rep
            lane, lane2, pool_sh = self._lane, self._lane2, self._pool_sh
            sample_op = self._sample_op

            def fn(params, tokens0, positions0, context_lens0, active, block_tables,
                   pool, mamba_state, history, sampling, step0):
                Sn = tokens0.shape[0]
                lanes = jnp.arange(Sn)
                stash = M.create_burst_stash(cfg, n_steps, Sn, layout=stash_layout)
                if hoist:
                    k_pre, v_pre = M.pregather_context(
                        cfg, pool, block_tables, bs, use_kernel=pregather_kernel
                    )
                else:
                    k_pre = v_pre = None

                def body(carry, i):
                    tokens, positions, stash, mamba, history, hist_lens = carry
                    logits, stash, mamba = M.decode_step_burst(
                        params, cfg, tokens, positions, context_lens0, i,
                        block_tables, pool, stash, mamba, bs, k_pre, v_pre,
                        valid_mask=active, ctx_transposed=pregather_kernel,
                        fused_attn=fused_attn,
                    )
                    sampled = sample_op(
                        logits.astype(jnp.float32), history, hist_lens,
                        sampling["temps"], sampling["topks"], sampling["topps"],
                        sampling["reps"], sampling["seeds"], step0 + i,
                    )
                    row = jnp.where(active, hist_lens, Lh)
                    history = history.at[lanes, row].set(sampled, mode="drop")
                    inc = active.astype(jnp.int32)
                    carry = (sampled, positions + inc, stash, mamba, history, hist_lens + inc)
                    return carry, sampled

                init = (
                    tokens0, positions0, stash, mamba_state, history,
                    sampling["hist_lens"],
                )
                (tok, pos, stash, mamba_state, history, hist_lens), ys = jax.lax.scan(
                    body, init, jnp.arange(n_steps, dtype=jnp.int32)
                )
                pool = M.flush_burst_stash(
                    pool, cfg, stash, block_tables, positions0, active, bs,
                    max_positions=self.ecfg.max_model_len,
                    use_kernel=flush_kernel,
                )
                sampling_out = dict(sampling)
                sampling_out["hist_lens"] = hist_lens
                if rep is not None:
                    ys = jax.lax.with_sharding_constraint(ys, rep)
                if lane is not None and lane is not rep:
                    history = jax.lax.with_sharding_constraint(history, lane2)
                    sampling_out = {
                        k: jax.lax.with_sharding_constraint(v, lane)
                        for k, v in sampling_out.items()
                    }
                    pool = {
                        k: jax.lax.with_sharding_constraint(v, pool_sh[k])
                        for k, v in pool.items()
                    }
                return ys, pool, mamba_state, history, sampling_out

            self._decode_cache[key] = jax.jit(fn, donate_argnums=(6, 7, 8, 9))
        return self._decode_cache[key]

    def _use_deferred_burst(self, nb: int, n_steps: int) -> bool:
        import os

        if os.environ.get("NANOVLLM_DEFER_KV") in ("0", "1"):
            return os.environ["NANOVLLM_DEFER_KV"] == "1"
        flag = self.ecfg.deferred_kv_writes
        if flag is not None:
            return flag
        # Auto: defer whenever more than one step rides the dispatch AND a
        # fast context path exists — either the hoisted pregather (short
        # contexts; must fit the HBM cap: deferred WITHOUT it measures
        # slower than per-step) or the stash-aware paged kernel (long
        # contexts — r5: the kernel scores the burst stash as an extra
        # flash block, so deferral composes with page DMAs).
        return n_steps > 1 and (
            M._paged_kernel_ok(nb * self.block_size) or self._pregather_fits(nb)
        )

    def _get_prefill_batch(self, N: int, T: int, nb: int):
        key = ("batch", N, T, nb)
        if key not in self._prefill_cache:
            cfg = self.mcfg
            bs = self.ecfg.kv_block_size
            rep = self._rep
            lane, pool_sh = self._lane, self._pool_sh

            def fn(params, tokens, positions, valid_lens, context_lens, block_tables, slot_mapping, pool, mamba_state, slot_idxs):
                logits, pool, mamba_state = M.prefill_batch(
                    params, cfg, tokens, positions, valid_lens, context_lens,
                    block_tables, slot_mapping, pool, bs, mamba_state, slot_idxs,
                )
                if rep is not None:
                    # Last-token logits are tiny: replicate them so host-side
                    # row slicing works identically under any mesh; anchor
                    # the pool back to its placement (DP-sharded groups
                    # reconcile their KV writes via an update all-gather).
                    logits = jax.lax.with_sharding_constraint(logits, rep)
                    if lane is not None and lane is not rep:
                        pool = {
                            k: jax.lax.with_sharding_constraint(v, pool_sh[k])
                            for k, v in pool.items()
                        }
                return logits, pool, mamba_state

            self._prefill_cache[key] = jax.jit(fn, donate_argnums=(7, 8))
        return self._prefill_cache[key]

    def _prefill_group(
        self, seqs: list[Sequence], Tb: int, nb: int, nb_force: int = 0
    ) -> list[jnp.ndarray]:
        """One batched-prefill dispatch for same-bucket sequences. `nb_force`
        pins the batch dim (prefill_fixed_groups: one program per (Tb, nb))."""
        n = len(seqs)
        Nb = nb_force if nb_force else bucket_length(n, 1, max(n, 1))
        tokens = np.zeros((Nb, Tb), np.int32)
        positions = np.zeros((Nb, Tb), np.int32)
        valid_lens = np.ones((Nb,), np.int32)
        context_lens = np.ones((Nb,), np.int32)
        block_tables = np.zeros((Nb, nb), np.int32)
        slot_mapping = np.full((Nb, Tb), self.num_slots_flat, np.int32)
        for i, seq in enumerate(seqs):
            start, end = _chunk_bounds(seq)
            chunk = seq.token_ids[start:end]
            tokens[i, : len(chunk)] = chunk
            positions[i] = np.arange(start, start + Tb)
            valid_lens[i] = len(chunk)
            context_lens[i] = end  # KV exists only up to the chunk end
            block_tables[i, : len(seq.block_table)] = seq.block_table
            slot_mapping[i] = kvc.make_slot_mapping(
                block_tables[i], start, len(chunk), self.block_size, Tb, self.num_slots_flat
            )
        # Hybrid groups park their final mamba states by decode slot; padding
        # rows pass an OOB slot so the scatter drops them.
        slot_idxs = np.full((Nb,), self.S, np.int32)
        slot_idxs[:n] = [seq.slot for seq in seqs]
        fn = self._get_prefill_batch(Nb, Tb, nb)
        # DP: shard the group's batch dim over 'data' when it divides evenly
        # (each replica prefills Nb/dp sequences); otherwise replicate.
        if self._lane is not None and self._lane is not self._rep and Nb % self._dp == 0:
            row, row2 = self._lane, self._lane2
        else:
            row = row2 = self._rep
        logits, self.pool, new_mamba = fn(
            self.params,
            self._dev(tokens, row2), self._dev(positions, row2),
            self._dev(valid_lens, row), self._dev(context_lens, row),
            self._dev(block_tables, row2),
            self._dev(slot_mapping.reshape(-1), row), self.pool,
            self.mamba_state, self._dev(slot_idxs),
        )
        if self.mamba_state is not None:
            self.mamba_state = new_mamba
        return logits  # [Nb, V] padded; rows [0, n) are the real sequences

    # ---- prefill ---------------------------------------------------------

    def _cp_applies(self, seq: Sequence) -> bool:
        """Context-parallel prefill gate: a fresh long prompt on a multi-chip
        mesh — token dim sharded over 'data' when dp>1, else over 'model'
        (tp-only). Requires no cached prefix (the in-flight chunk must BE the
        whole context; a prefix-cache hit falls back to the dense path — a
        known latency cliff on long shared-prefix prompts, see
        EngineConfig.context_parallel) and no Mamba layers, whose prefill is
        a sequential state scan."""
        if not (self.ecfg.context_parallel and self._cp_axis is not None):
            return False
        if self.mcfg.is_hybrid:
            return False
        if not (
            _is_final_chunk(seq)
            and seq.num_prefilled_tokens <= seq.num_cached_tokens
        ):
            return False  # mid-chunk-train: the chunk isn't the whole suffix
        suffix = len(seq) - seq.num_cached_tokens
        Tb = bucket_length(suffix, self.ecfg.min_prefill_bucket, self.ecfg.max_model_len)
        return Tb >= self.ecfg.cp_min_tokens and Tb % self._cp_size == 0

    def _prefill_one_cp(self, seq: Sequence) -> jnp.ndarray:
        """One sequence's prompt (suffix past any cached prefix), token dim
        sharded over the CP axis."""
        start = seq.num_cached_tokens
        chunk = seq.token_ids[start:]
        T_real = len(chunk)
        Tb = bucket_length(T_real, self.ecfg.min_prefill_bucket, self.ecfg.max_model_len)
        ctx_blocks = len(seq.block_table)
        nb = bucket_length(ctx_blocks, 1, self.max_blocks_per_seq)

        tokens = np.zeros((Tb,), np.int32)
        tokens[:T_real] = chunk
        positions = np.arange(start, start + Tb, dtype=np.int32)
        block_table = np.zeros((nb,), np.int32)
        block_table[:ctx_blocks] = seq.block_table
        slot_mapping = kvc.make_slot_mapping(
            block_table, start, T_real, self.block_size, Tb, self.num_slots_flat
        )
        fn = self._get_prefill_cp(Tb, nb, has_prefix=start > 0)
        logits, self.pool, _ = fn(
            self.params,
            self._dev(tokens, self._cp_sh),
            self._dev(positions, self._cp_sh),
            self._dev(np.int32(T_real)),
            self._dev(np.int32(len(seq))),
            self._dev(block_table),
            self._dev(slot_mapping, self._cp_sh),
            self.pool,
            None,
            self._dev(np.int32(seq.slot if seq.slot is not None else 0)),
        )
        return logits

    def _prefill_one(self, seq: Sequence) -> jnp.ndarray:
        start, end = _chunk_bounds(seq)
        chunk = seq.token_ids[start:end]
        T_real = len(chunk)
        Tb = bucket_length(T_real, self.ecfg.min_prefill_bucket, self.ecfg.max_model_len)
        ctx_blocks = len(seq.block_table)
        nb = bucket_length(ctx_blocks, 1, self.max_blocks_per_seq)

        tokens = np.zeros((Tb,), np.int32)
        tokens[:T_real] = chunk
        positions = np.arange(start, start + Tb, dtype=np.int32)
        block_table = np.zeros((nb,), np.int32)
        block_table[:ctx_blocks] = seq.block_table
        slot_mapping = kvc.make_slot_mapping(
            block_table, start, T_real, self.block_size, Tb, self.num_slots_flat
        )
        fn = self._get_prefill(Tb, nb)
        logits, self.pool, new_mamba = fn(
            self.params,
            self._dev(tokens),
            self._dev(positions),
            self._dev(np.int32(T_real)),
            self._dev(np.int32(end)),
            self._dev(block_table),
            self._dev(slot_mapping),
            self.pool,
            self.mamba_state,
            self._dev(np.int32(seq.slot if seq.slot is not None else 0)),
        )
        if self.mamba_state is not None:
            self.mamba_state = new_mamba
        return logits

    def _state_batch(self, n: int) -> int:
        """Batch dim for the small host->device state-update programs
        (history/sampling-row scatters). Under prefill_fixed_groups these
        pad to the full slot count so ONE program serves every group size —
        per-n variants thrash small executable caches (docs/PERFORMANCE.md
        r4 serving notes); padding rows carry an OOB index and drop."""
        if self.ecfg.prefill_fixed_groups:
            return self.S
        return n

    def _setup_slots(self, seqs: list[Sequence]) -> None:
        """One batched device update for every admitted sequence's sampling
        row + history (was per-sequence: N small dispatches per prefill)."""
        if not seqs:
            return
        nb = self._state_batch(len(seqs))
        idx = np.full((nb,), self.S, np.int32)  # pad rows -> OOB, dropped
        idx[: len(seqs)] = [s.slot for s in seqs]
        Lh = self.history.shape[1]
        rows = np.full((nb, Lh), self.mcfg.vocab_size, np.int32)
        for i, seq in enumerate(seqs):
            s = seq.slot
            sp = seq.sampling_params
            self.h_temps[s] = sp.temperature
            self.h_topks[s] = sp.top_k
            self.h_topps[s] = sp.top_p
            self.h_reps[s] = sp.repetition_penalty
            self.h_seeds[s] = np.uint32(
                (sp.seed if sp.seed is not None else seq.seq_id) & 0xFFFFFFFF
            )
            self.h_hist_lens[s] = len(seq)
            rows[i, : len(seq)] = seq.token_ids
        di = self._dev(idx)
        ig = np.minimum(idx, self.S - 1)  # value gather for pad rows (dropped)
        self.history = self.history.at[di].set(self._dev(rows), mode="drop")
        d = self.d_sampling
        self.d_sampling = {
            "temps": d["temps"].at[di].set(self._dev(self.h_temps[ig]), mode="drop"),
            "topks": d["topks"].at[di].set(self._dev(self.h_topks[ig]), mode="drop"),
            "topps": d["topps"].at[di].set(self._dev(self.h_topps[ig]), mode="drop"),
            "reps": d["reps"].at[di].set(self._dev(self.h_reps[ig]), mode="drop"),
            "seeds": d["seeds"].at[di].set(self._dev(self.h_seeds[ig]), mode="drop"),
            "hist_lens": d["hist_lens"].at[di].set(self._dev(self.h_hist_lens[ig]), mode="drop"),
        }

    # ---- public API ------------------------------------------------------

    def run(self, seqs: list[Sequence], is_prefill: bool) -> list[int]:
        if self.mesh is not None:
            with self.mesh:
                return self._run_prefill(seqs) if is_prefill else self._run_decode(seqs)
        return self._run_prefill(seqs) if is_prefill else self._run_decode(seqs)

    PREFILL_GROUP_TOKEN_BUDGET = 4096  # padded tokens per batched dispatch

    def _run_prefill(self, seqs: list[Sequence]) -> list[list[int]]:
        self._setup_slots(seqs)
        fixed = self.ecfg.prefill_fixed_groups
        sampled: dict[int, int] = {}
        logits_by_seq: dict[int, jnp.ndarray] = {}  # loose [V] rows
        cp_ids = set()
        for seq in seqs:
            if self._cp_applies(seq):
                logits_by_seq[seq.seq_id] = self._prefill_one_cp(seq)
                cp_ids.add(seq.seq_id)
        if cp_ids:
            seqs_rest = [s for s in seqs if s.seq_id not in cp_ids]
        else:
            seqs_rest = seqs
        if self.mcfg.is_hybrid and self.mesh is not None:
            # Mesh-hybrid fallback: the mamba state is mesh-sharded and the
            # batched scatter would need per-axis reconciliation — per-seq
            # prefill keeps the sharded-state path simple.
            for seq in seqs_rest:
                logits_by_seq[seq.seq_id] = self._prefill_one(seq)
        else:
            # Group same-bucket sequences into batched dispatches.
            groups: dict[tuple[int, int], list[Sequence]] = {}
            for seq in seqs_rest:
                start, end = _chunk_bounds(seq)
                T_real = end - start
                Tb = bucket_length(T_real, self.ecfg.min_prefill_bucket, self.ecfg.max_model_len)
                nb = bucket_length(len(seq.block_table), 1, self.max_blocks_per_seq + 1)
                groups.setdefault((Tb, nb), []).append(seq)
            for (Tb, nb), group in groups.items():
                per_call = max(1, self.PREFILL_GROUP_TOKEN_BUDGET // Tb)
                nb_force = 0
                if fixed:
                    # One program per (Tb, nb): every dispatch padded to the
                    # same batch dim (the largest a dispatch can carry).
                    cap = min(self.ecfg.max_num_seqs, self.S)
                    nb_force = bucket_length(min(per_call, cap), 1, per_call)
                for i in range(0, len(group), per_call):
                    sub = group[i : i + per_call]
                    glogits = self._prefill_group(sub, Tb, nb, nb_force)
                    if fixed:
                        # Sample the padded group DIRECTLY: one sampling
                        # program per group shape, no per-n stack/pad
                        # programs (executable-cache control; mid-chunk
                        # rows sample too but their token is discarded).
                        Nb = glogits.shape[0]
                        slots = np.zeros((Nb,), np.int32)
                        slots[: len(sub)] = [s.slot for s in sub]
                        toks = self._sample_for(glogits, slots)
                        finals = [s for s in sub if _is_final_chunk(s)]
                        for s, t in zip(sub, toks[: len(sub)]):
                            if _is_final_chunk(s):
                                sampled[s.seq_id] = int(t)
                        self._append_history(
                            finals, [sampled[s.seq_id] for s in finals]
                        )
                    else:
                        for j, seq in enumerate(sub):
                            logits_by_seq[seq.seq_id] = glogits[j]
        # Loose rows (CP / mesh-hybrid / non-fixed groups): stack + sample.
        # Only sequences whose chunk completed their prompt get a token; a
        # mid-prefill chunk returns an empty burst.
        final_loose = [
            s for s in seqs if _is_final_chunk(s) and s.seq_id in logits_by_seq
        ]
        if final_loose:
            n = len(final_loose)
            nb_batch = bucket_length(n, 1, max(self.S, n))
            logits = jnp.stack([logits_by_seq[s.seq_id] for s in final_loose])
            if nb_batch > n:
                logits = jnp.pad(logits, ((0, nb_batch - n), (0, 0)))
            slots = np.array(
                [s.slot for s in final_loose] + [0] * (nb_batch - n), np.int32
            )
            tokens = self._sample_for(logits, slots)
            for s, t in zip(final_loose, tokens[:n]):
                sampled[s.seq_id] = int(t)
            self._append_history(final_loose, [sampled[s.seq_id] for s in final_loose])
        return [[sampled[s.seq_id]] if s.seq_id in sampled else [] for s in seqs]

    def _sync_hist_lens_to_device(self, slots: list[int]) -> None:
        d = self.d_sampling
        nb = self._state_batch(len(slots))
        idx = np.full((nb,), self.S, np.int32)
        idx[: len(slots)] = slots
        ig = np.minimum(idx, self.S - 1)
        self.d_sampling = {
            **d,
            "hist_lens": d["hist_lens"].at[self._dev(idx)].set(
                self._dev(self.h_hist_lens[ig]), mode="drop"
            ),
        }

    def _run_decode(self, seqs: list[Sequence]) -> list[list[int]]:
        S = self.S
        n_steps = self.ecfg.decode_burst
        if self.ecfg.clamp_burst_to_budget:
            # Largest remaining deterministic budget across lanes: running a
            # longer burst only samples tokens postprocess must discard
            # (stop-token finishes stay unpredictable — that trim remains).
            rem = 1
            for seq in seqs:
                r = min(
                    seq.sampling_params.max_tokens - seq.num_completion_tokens,
                    self.ecfg.max_model_len - len(seq),
                )
                rem = max(rem, r)
            if rem < n_steps:
                n_steps = bucket_length(rem, 1, n_steps)
        tokens = np.zeros((S,), np.int32)
        positions = np.zeros((S,), np.int32)
        context_lens = np.ones((S,), np.int32)
        active = np.zeros((S,), bool)
        max_nb = max(len(s.block_table) for s in seqs)
        nb = bucket_length(max_nb, 1, self.max_blocks_per_seq + 1)
        block_tables = np.zeros((S, nb), np.int32)
        for seq in seqs:
            s = seq.slot
            n = len(seq)
            tokens[s] = seq.token_ids[-1]
            positions[s] = n - 1
            context_lens[s] = n
            active[s] = True
            block_tables[s, : len(seq.block_table)] = seq.block_table

        if self._use_deferred_burst(nb, n_steps):
            fn = self._get_decode_burst(nb, n_steps)
        else:
            fn = self._get_decode(nb, n_steps)
        step0 = self.step_counter
        self.step_counter += n_steps
        ys, self.pool, new_mamba, self.history, self.d_sampling = fn(
            self.params,
            self._dev(tokens, self._lane),
            self._dev(positions, self._lane),
            self._dev(context_lens, self._lane),
            self._dev(active, self._lane),
            self._dev(block_tables, self._lane2),
            self.pool,
            self.mamba_state,
            self.history,
            self.d_sampling,
            self._dev(np.int32(step0)),
        )
        if self.mamba_state is not None:
            self.mamba_state = new_mamba
        ys = np.asarray(jax.device_get(ys))  # [n_steps, S]
        out = []
        for seq in seqs:
            out.append([int(t) for t in ys[:, seq.slot]])
            # Advancing by the full burst is exact for every sequence that
            # keeps running: postprocess only trims a burst when a stop
            # condition fires, and then the sequence FINISHES and frees its
            # slot — _setup_slots rebuilds history/hist_lens from scratch when
            # the slot is reused (regression: test_slot_reuse_resets_history).
            self.h_hist_lens[seq.slot] += n_steps
        return out

    def _sample_for(self, logits: jnp.ndarray, slots: np.ndarray) -> np.ndarray:
        self.step_counter += 1
        hist = self.history[self._dev(slots)]
        toks = self._sample_fn(
            logits.astype(jnp.float32),
            hist,
            self._dev(self.h_hist_lens[slots]),
            self._dev(self.h_temps[slots]),
            self._dev(self.h_topks[slots]),
            self._dev(self.h_topps[slots]),
            self._dev(self.h_reps[slots]),
            self._dev(self.h_seeds[slots]),
            self._dev(np.int32(self.step_counter)),
        )
        return np.asarray(jax.device_get(toks))

    def _append_history(self, seqs: list[Sequence], tokens: list[int]) -> None:
        if not seqs:
            return
        nb = self._state_batch(len(seqs))
        idx = np.full((nb,), self.S, np.int32)
        idx[: len(seqs)] = [s.slot for s in seqs]
        ig = np.minimum(idx, self.S - 1)
        vals_np = np.zeros((nb,), np.int32)
        vals_np[: len(seqs)] = tokens
        self.history = self.history.at[
            self._dev(idx), self._dev(self.h_hist_lens[ig])
        ].set(self._dev(vals_np), mode="drop")
        for s in seqs:
            self.h_hist_lens[s.slot] += 1
        self._sync_hist_lens_to_device([s.slot for s in seqs])

    def close(self) -> None:
        pass
