"""Test environment: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4 'multi-node without a real
cluster'). Must run before jax is imported anywhere."""

import os

# Force CPU even when the ambient environment points at a TPU (JAX_PLATFORMS
# may be pre-set to the tunneled TPU platform): unit tests are numerics tests
# and need fp32 matmuls, and CI must not depend on TPU availability.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# The image's sitecustomize registers the tunneled TPU PJRT plugin at
# interpreter start and force-selects it via jax.config — undo that before
# any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
