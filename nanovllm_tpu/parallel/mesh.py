"""Device mesh helpers.

Single axis pair ('data', 'model'): tensor parallelism (attention heads, FFN
inner dim, MoE experts, KV heads) rides 'model' over ICI; 'data' is for
replica/continuous-batching parallelism across hosts (DCN). The design
follows the standard JAX SPMD recipe: build a Mesh, annotate shardings, let
XLA GSPMD insert all-gather/reduce-scatter/psum collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(tp_size: int = 1, dp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
