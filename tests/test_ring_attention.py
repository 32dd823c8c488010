"""Ring attention (context parallelism) vs single-device dense attention on
the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nanovllm_tpu.ops.attention import attention_chunk
from nanovllm_tpu.ops.ring_attention import ring_attention


def run_case(T, S, H, Hkv, D, window=0, q_start=None, seed=0, n_dev=8):
    devs = jax.devices()
    assert len(devs) >= n_dev
    mesh = Mesh(np.array(devs[:n_dev]), ("sp",))
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((S, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((S, Hkv, D)).astype(np.float32)
    q_start = S - T if q_start is None else q_start  # chunk at the context end
    q_pos = np.arange(q_start, q_start + T, dtype=np.int32)
    k_pos = np.arange(S, dtype=np.int32)
    scale = 1.0 / np.sqrt(D)

    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(k_pos), mesh, "sp", scale, window,
    )
    ref = attention_chunk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(q_pos), jnp.asarray(k_pos), jnp.int32(S), scale, window,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gqa_causal():
    run_case(T=64, S=64, H=8, Hkv=2, D=32)


def test_prefix_context_longer_than_chunk():
    # S > T: the chunk attends to a long prefix spread over the ring.
    run_case(T=32, S=128, H=4, Hkv=4, D=16)


def test_sliding_window():
    run_case(T=64, S=64, H=4, Hkv=2, D=16, window=24)


def test_mqa():
    run_case(T=32, S=64, H=12, Hkv=1, D=16)


def test_jit_under_mesh():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ("sp",))
    rng = np.random.default_rng(3)
    T, S, H, Hkv, D = 32, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((S, Hkv, D)).astype(np.float32))
    q_pos = jnp.arange(S - T, S, dtype=jnp.int32)
    k_pos = jnp.arange(S, dtype=jnp.int32)

    fn = jax.jit(lambda *a: ring_attention(*a, mesh=mesh, axis="sp", scale=0.25))
    out = fn(q, k, v, q_pos, k_pos)
    ref = attention_chunk(q, k, v, q_pos, k_pos, jnp.int32(S), 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
