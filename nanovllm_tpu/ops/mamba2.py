"""Mamba2 selective-state-space layer (Granite 4.0 hybrid).

Replaces /root/reference/purego/tensor/mamba2.go — in_proj → [gate, xBC, dt]
split (:87-102), left-padded causal depthwise conv1d (:183-247), SiLU,
x/B/C split (:113-119), softplus(dt + dt_bias) (:122-129), selective scan with
ZOH discretization `state = exp(A*dt)*state + dt*x*B`, `y = C.state + D*x`
(:250-351), gated RMSNorm (:137-169), out_proj (:173-176).

Key structural difference from the reference: the reference keeps SSM state
*on the layer object* (one global sequence at a time, reset on each new
prefill — generic_model.go:286-292). Here state is an explicit per-decode-slot
pytree (`conv`: last d_conv-1 pre-conv inputs, `ssm`: [H, P, N] fp32 state)
threaded through the jitted step functions, so many sequences decode
concurrently — the same slot discipline as the paged KV pool.

The prefill scan is chunked SSD-style (`_prefill_core`): sequential only
across chunks, dense MXU einsums inside a chunk — exact, not an
approximation. Decode is a single O(1) state update. Batched prefill
(`mamba2_prefill_batch`) vmaps the same core over the group's sequences and
parks every final state with one scatter, so hybrid models share batched
prefill dispatches with the attention-only families.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import LayerKind, ModelConfig
from nanovllm_tpu.ops.norms import rms_norm


def mamba_layer_index(cfg: ModelConfig, layer_idx: int) -> int:
    return sum(1 for k in cfg.layer_kinds[:layer_idx] if k == LayerKind.MAMBA2)


def num_mamba_layers(cfg: ModelConfig) -> int:
    return sum(1 for k in cfg.layer_kinds if k == LayerKind.MAMBA2)


def _dims(cfg: ModelConfig):
    d_inner = cfg.mamba_n_heads * cfg.mamba_head_dim
    conv_dim = d_inner + 2 * cfg.mamba_n_groups * cfg.mamba_d_state
    return d_inner, conv_dim


def init_mamba_params(cfg: ModelConfig, rng) -> dict:
    E = cfg.hidden_size
    H, P, S, G = cfg.mamba_n_heads, cfg.mamba_head_dim, cfg.mamba_d_state, cfg.mamba_n_groups
    d_inner, conv_dim = _dims(cfg)
    d_proj = 2 * d_inner + 2 * G * S + H

    def w(shape, s=0.02):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    return {
        "in_proj": {"w": w((E, d_proj))},
        "conv_w": w((cfg.mamba_d_conv, conv_dim), 0.2),  # depthwise, time-major
        "conv_b": np.zeros((conv_dim,), np.float32),
        "A_log": np.log(np.arange(1, H + 1, dtype=np.float32)),
        "D": np.ones((H,), np.float32),
        "dt_bias": np.zeros((H,), np.float32),
        "norm_scale": np.ones((d_inner,), np.float32),
        "out_proj": {"w": w((d_inner, E))},
    }


def create_mamba_state(cfg: ModelConfig, num_slots: int) -> dict:
    """Per-decode-slot recurrent state for all mamba layers."""
    L = num_mamba_layers(cfg)
    H, P, S = cfg.mamba_n_heads, cfg.mamba_head_dim, cfg.mamba_d_state
    _, conv_dim = _dims(cfg)
    return {
        "conv": jnp.zeros((L, num_slots, cfg.mamba_d_conv - 1, conv_dim), jnp.float32),
        "ssm": jnp.zeros((L, num_slots, H, P, S), jnp.float32),
    }


def _split_proj(cfg: ModelConfig, proj: jnp.ndarray):
    d_inner, conv_dim = _dims(cfg)
    gate = proj[..., :d_inner]
    xbc = proj[..., d_inner : d_inner + conv_dim]
    dt = proj[..., d_inner + conv_dim :]
    return gate, xbc, dt


def _ssm_params(cfg: ModelConfig, p: dict, dt_raw: jnp.ndarray):
    A = -jnp.exp(p["A_log"].astype(jnp.float32))  # [H]
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    return A, dt


def _gated_out(cfg: ModelConfig, p: dict, y: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    from nanovllm_tpu.ops.linear import linear

    y = y * jax.nn.silu(gate.astype(jnp.float32))
    y = rms_norm(y, p["norm_scale"], cfg.norm_eps)
    return linear(p["out_proj"], y.astype(gate.dtype))


def _prefill_core(
    cfg: ModelConfig,
    p: dict,
    x: jnp.ndarray,          # [T, E]
    valid_len: jnp.ndarray,  # scalar int32
    init_ssm: jnp.ndarray | None = None,   # [H, P, S] resume state (chunked)
    init_conv: jnp.ndarray | None = None,  # [K-1, conv_dim] resume conv rows
):
    """One sequence's mamba2 prefill over a (possibly mid-prompt) chunk.
    init_ssm/init_conv resume the scan from a previous chunk's parked state
    (zeros = fresh prompt — identical numerics to the unchunked scan).
    Returns (out [T, E], final_ssm_state [H, P, S], conv_rows [K-1,
    conv_dim]) — pure in the sequence, so the batched variant is a vmap."""
    from nanovllm_tpu.ops.linear import linear

    T = x.shape[0]
    H, P, S, G = cfg.mamba_n_heads, cfg.mamba_head_dim, cfg.mamba_d_state, cfg.mamba_n_groups
    d_inner, conv_dim = _dims(cfg)

    proj = linear(p["in_proj"], x)
    gate, xbc, dt_raw = _split_proj(cfg, proj)
    tmask = (jnp.arange(T) < valid_len).astype(jnp.float32)  # [T]
    xbc_f = xbc.astype(jnp.float32) * tmask[:, None]

    # Causal depthwise conv1d, left-padded with the previous chunk's last
    # K-1 pre-conv rows (zeros on a fresh prompt).
    K = cfg.mamba_d_conv
    if init_conv is None:
        init_conv = jnp.zeros((K - 1, conv_dim), jnp.float32)
    padded = jnp.concatenate([init_conv.astype(jnp.float32), xbc_f], axis=0)
    conv = sum(
        padded[j : j + T] * p["conv_w"][j].astype(jnp.float32)[None, :] for j in range(K)
    ) + p["conv_b"].astype(jnp.float32)[None, :]
    conv = jax.nn.silu(conv)

    xs = conv[:, :d_inner].reshape(T, H, P)
    B = conv[:, d_inner : d_inner + G * S].reshape(T, G, S)
    C = conv[:, d_inner + G * S :].reshape(T, G, S)
    A, dt = _ssm_params(cfg, p, dt_raw)  # A [H], dt [T, H]
    dt = dt * tmask[:, None]  # frozen state past valid_len

    group_of_head = jnp.repeat(jnp.arange(G), H // G)  # [H]
    Bh = B[:, group_of_head]  # [T, H, S]
    Ch = C[:, group_of_head]  # [T, H, S]
    logd = A[None, :] * dt  # [T, H], log of the per-step decay (<= 0)

    # Chunked (SSD-style) scan: sequential only across chunks; inside a chunk
    # everything is dense einsums on the MXU. Replaces the reference's
    # per-token loop (mamba2.go:250-351) — SURVEY.md §7 'Hard parts #7'.
    #   s_t = P_t*S0 + sum_{i<=t} (P_t/P_i) * dt_i * x_i ⊗ B_i,
    #   y_t = C_t · s_t,  with P_t = exp(cumsum(logd)) (ratios are exp of
    #   differences of a non-increasing cumsum — never overflow).
    C_CH = min(64, T)
    while T % C_CH != 0:
        C_CH //= 2
    n_chunks = T // C_CH

    def reshape_c(a):
        return a.reshape((n_chunks, C_CH) + a.shape[1:])

    xs_c, Bh_c, Ch_c, dt_c, logd_c = map(reshape_c, (xs, Bh, Ch, dt, logd))
    causal = jnp.tril(jnp.ones((C_CH, C_CH), jnp.float32))

    def chunk_step(S0, inp):
        x_k, B_k, C_k, dt_k, ld_k = inp  # [C, H, P] / [C, H, S] / ... / [C, H]
        cum = jnp.cumsum(ld_k, axis=0)  # [C, H]
        Pt = jnp.exp(cum)
        y0 = Pt[:, :, None] * jnp.einsum("chs,hps->chp", C_k, S0)
        CB = jnp.einsum("chs,ihs->cih", C_k, B_k)  # [C, i, H]
        # Mask the exponent BEFORE exp: the non-causal (i > t) differences
        # are positive and overflow to inf (inf * causal-0 = NaN).
        expo = cum[:, None, :] - cum[None, :, :]  # log(P_t / P_i)
        expo = jnp.where(causal[:, :, None] > 0, expo, -jnp.inf)
        G = CB * jnp.exp(expo) * dt_k[None, :, :]
        y_intra = jnp.einsum("cih,ihp->chp", G, x_k)
        w = jnp.exp(cum[-1][None, :] - cum) * dt_k  # [C, H]
        S_new = jnp.exp(cum[-1])[:, None, None] * S0 + jnp.einsum(
            "ch,chp,chs->hps", w, x_k, B_k
        )
        return S_new, y0 + y_intra

    init = (
        jnp.zeros((H, P, S), jnp.float32) if init_ssm is None
        else init_ssm.astype(jnp.float32)
    )
    final_state, ys = jax.lax.scan(chunk_step, init, (xs_c, Bh_c, Ch_c, dt_c, logd_c))
    ys = ys.reshape(T, H, P)
    y = ys + xs * p["D"].astype(jnp.float32)[None, :, None]
    out = _gated_out(cfg, p, y.reshape(T, d_inner), gate)

    # Last K-1 valid pre-conv rows (reaching into init_conv when the chunk
    # is shorter than the window): the next chunk's / decode's conv seed.
    ext = jnp.concatenate([padded[: K - 1], xbc_f], axis=0)  # [K-1+T, conv]
    idx = jnp.clip(jnp.arange(K - 1) + valid_len, 0, ext.shape[0] - 1)
    conv_rows = jnp.take(ext, idx, axis=0)
    return out, final_state, conv_rows


def mamba2_prefill(
    cfg: ModelConfig,
    p: dict,
    x: jnp.ndarray,        # [T, E]
    valid_len: jnp.ndarray,  # scalar int32
    state: dict | None,
    layer_idx: int,
    slot_idx: jnp.ndarray | None,  # scalar int32: decode slot to park final state in
    chunk_start=None,  # scalar int32: chunk's first position; >0 resumes the
    #                    scan from the state parked by the previous chunk
):
    li = mamba_layer_index(cfg, layer_idx)
    init_ssm = init_conv = None
    if state is not None and slot_idx is not None and chunk_start is not None:
        resume = (chunk_start > 0).astype(jnp.float32)
        si = jnp.clip(slot_idx, 0, state["ssm"].shape[1] - 1)
        init_ssm = state["ssm"][li, si] * resume
        init_conv = state["conv"][li, si] * resume
    out, final_state, conv_rows = _prefill_core(
        cfg, p, x, valid_len, init_ssm, init_conv
    )
    if state is not None and slot_idx is not None:
        # Park final conv + ssm state in this sequence's decode slot.
        state = {
            "conv": state["conv"].at[li, slot_idx].set(conv_rows),
            "ssm": state["ssm"].at[li, slot_idx].set(final_state),
        }
    return out, state


def mamba2_prefill_batch(
    cfg: ModelConfig,
    p: dict,
    x: jnp.ndarray,           # [N, T, E]
    valid_lens: jnp.ndarray,  # [N] int32
    state: dict | None,
    layer_idx: int,
    slot_idxs: jnp.ndarray | None,  # [N] int32 decode slots (OOB row => dropped)
    chunk_starts: jnp.ndarray | None = None,  # [N] int32; >0 resumes per row
):
    """Batched mamba2 prefill: vmap of `_prefill_core` over the group's
    sequences plus ONE scatter parking all final states. Padding rows in the
    group pass an out-of-range slot (mode='drop')."""
    li = mamba_layer_index(cfg, layer_idx)
    if state is not None and slot_idxs is not None and chunk_starts is not None:
        resume = (chunk_starts > 0).astype(jnp.float32)
        si = jnp.clip(slot_idxs, 0, state["ssm"].shape[1] - 1)
        init_ssm = state["ssm"][li, si] * resume[:, None, None, None]
        init_conv = state["conv"][li, si] * resume[:, None, None]
        out, final_states, conv_rows = jax.vmap(
            lambda xi, vi, s0, c0: _prefill_core(cfg, p, xi, vi, s0, c0)
        )(x, valid_lens, init_ssm, init_conv)
    else:
        out, final_states, conv_rows = jax.vmap(
            lambda xi, vi: _prefill_core(cfg, p, xi, vi)
        )(x, valid_lens)
    if state is not None and slot_idxs is not None:
        state = {
            "conv": state["conv"].at[li, slot_idxs].set(conv_rows, mode="drop"),
            "ssm": state["ssm"].at[li, slot_idxs].set(final_states, mode="drop"),
        }
    return out, state


def mamba2_decode(
    cfg: ModelConfig,
    p: dict,
    x: jnp.ndarray,  # [Bslots, E]
    state: dict,
    layer_idx: int,
    valid_mask: jnp.ndarray | None = None,  # [Bslots] bool: freeze others
):
    from nanovllm_tpu.ops.linear import linear

    Bn = x.shape[0]
    H, P, S, G = cfg.mamba_n_heads, cfg.mamba_head_dim, cfg.mamba_d_state, cfg.mamba_n_groups
    d_inner, conv_dim = _dims(cfg)
    K = cfg.mamba_d_conv
    li = mamba_layer_index(cfg, layer_idx)

    proj = linear(p["in_proj"], x)
    gate, xbc, dt_raw = _split_proj(cfg, proj)
    xbc_f = xbc.astype(jnp.float32)

    conv_hist = state["conv"][li]  # [Bn, K-1, conv_dim]
    window = jnp.concatenate([conv_hist, xbc_f[:, None, :]], axis=1)  # [Bn, K, conv]
    conv = jnp.einsum("bkc,kc->bc", window, p["conv_w"].astype(jnp.float32)) + p["conv_b"].astype(
        jnp.float32
    )
    conv = jax.nn.silu(conv)

    xs = conv[:, :d_inner].reshape(Bn, H, P)
    B = conv[:, d_inner : d_inner + G * S].reshape(Bn, G, S)
    C = conv[:, d_inner + G * S :].reshape(Bn, G, S)
    A, dt = _ssm_params(cfg, p, dt_raw)  # dt [Bn, H]

    group_of_head = jnp.repeat(jnp.arange(G), H // G)
    Bh = B[:, group_of_head]  # [Bn, H, S]
    Ch = C[:, group_of_head]
    dA = jnp.exp(A[None, :] * dt)  # [Bn, H]
    ssm = state["ssm"][li]  # [Bn, H, P, S]
    new_ssm = ssm * dA[:, :, None, None] + dt[:, :, None, None] * xs[:, :, :, None] * Bh[:, :, None, :]
    y = jnp.einsum("bhps,bhs->bhp", new_ssm, Ch) + xs * p["D"].astype(jnp.float32)[None, :, None]
    out = _gated_out(cfg, p, y.reshape(Bn, d_inner), gate)

    # Freeze inactive lanes' state: a decode step dispatches every slot's
    # row, but slots that are mid-chunk-train (hybrid chunked prefill
    # alternates decode bursts with the train) or unoccupied must not have
    # their parked state garbage-advanced.
    new_conv = window[:, 1:, :]
    if valid_mask is not None:
        m = valid_mask
        new_conv = jnp.where(m[:, None, None], new_conv, conv_hist)
        new_ssm = jnp.where(m[:, None, None, None], new_ssm, ssm)
    state = {
        "conv": state["conv"].at[li].set(new_conv),
        "ssm": state["ssm"].at[li].set(new_ssm),
    }
    return out, state
