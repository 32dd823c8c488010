"""Grouped-RMW Pallas KV row writer vs the XLA scatter (interpret mode).

Decode-shaped writes: every in-bounds row in a distinct 8-row group (the
kernel's caller-enforced precondition), plus OOB padding lanes that must drop.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.pallas import kv_write as kw


@pytest.fixture(autouse=True)
def _interpret():
    kw.set_interpret(True)
    yield
    kw.set_interpret(False)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.int8])
def test_kv_write_rows_matches_scatter(dtype):
    rng = np.random.default_rng(0)
    total, R, B = 256, 256, 16
    if dtype == jnp.int8:
        kp = rng.integers(-100, 100, (total, R)).astype(np.int8)
        vp = rng.integers(-100, 100, (total, R)).astype(np.int8)
        kvals = rng.integers(-100, 100, (B, R)).astype(np.int8)
        vvals = rng.integers(-100, 100, (B, R)).astype(np.int8)
    else:
        kp = rng.standard_normal((total, R)).astype(np.float32)
        vp = rng.standard_normal((total, R)).astype(np.float32)
        kvals = rng.standard_normal((B, R)).astype(np.float32)
        vvals = rng.standard_normal((B, R)).astype(np.float32)
    # one row per 8-row group (decode invariant), some lanes OOB
    groups = rng.permutation(total // kw.GROUP)[:B]
    rows = groups * kw.GROUP + rng.integers(0, kw.GROUP, B)
    rows[3] = total        # padding sentinel
    rows[11] = total + 7   # arbitrary OOB
    rows = rows.astype(np.int32)

    kpool = jnp.asarray(kp).astype(dtype)
    vpool = jnp.asarray(vp).astype(dtype)
    k = jnp.asarray(kvals).astype(dtype)
    v = jnp.asarray(vvals).astype(dtype)

    ko, vo = kw.kv_write_rows(kpool, vpool, k, v, jnp.asarray(rows))
    kref = kpool.at[jnp.asarray(rows)].set(k, mode="drop")
    vref = vpool.at[jnp.asarray(rows)].set(v, mode="drop")
    np.testing.assert_array_equal(np.asarray(ko, np.float32), np.asarray(kref, np.float32))
    np.testing.assert_array_equal(np.asarray(vo, np.float32), np.asarray(vref, np.float32))


def test_kv_write_via_kv_cache_decode_path():
    """kv_write(decode=True) forced through the kernel == scatter path."""
    from nanovllm_tpu.ops import kv_cache as kvc

    rng = np.random.default_rng(1)
    L, nslots, Hkv, D, B = 2, 128, 2, 128, 8
    pool = {
        "k": jnp.asarray(rng.standard_normal((L * nslots, Hkv * D)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((L * nslots, Hkv * D)), jnp.float32),
    }
    k = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    # distinct 16-slot blocks per lane -> distinct 8-row groups
    slots = (np.arange(B) * 16 + rng.integers(0, 16, B)).astype(np.int32)
    slots[5] = nslots  # per-layer OOB sentinel
    sm = jnp.asarray(slots)

    kvc.set_use_write_kernel(True)
    try:
        got = kvc.kv_write(pool, 1, nslots, k, v, sm, decode=True)
    finally:
        kvc.set_use_write_kernel(None)
    want = kvc.kv_write(pool, 1, nslots, k, v, sm, decode=False)
    np.testing.assert_allclose(np.asarray(got["k"]), np.asarray(want["k"]))
    np.testing.assert_allclose(np.asarray(got["v"]), np.asarray(want["v"]))
