"""Test configuration: force CPU backend with 8 virtual devices.

The reference has no fake-backend story at all (its collective backend is
hardcoded NCCL — distributed_image_translation.py:35). We test multi-device
SPMD without a TPU slice via the standard JAX trick of N virtual CPU
devices, and all fidelity tests run in f32 on CPU.

Must run before any jax import, hence module-level os.environ here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU platform regardless of the
# env var, so pin the config explicitly before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Keep the decoded-sample cache out of the user's ~/.cache during tests.
import tempfile  # noqa: E402

_cache_dir = tempfile.mkdtemp(prefix="discogan_test_cache_")
os.environ.setdefault("DISCOGAN_CACHE_DIR", _cache_dir)
