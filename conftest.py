"""Root pytest config: force JAX onto a virtual 8-device CPU mesh.

Must run before any ``import jax`` so the flags take effect; tests exercise
the same sharding code paths the TPU pod uses, per SURVEY.md §4.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The axon sitecustomize registers the TPU backend in every interpreter and
# force-sets jax_platforms="axon,cpu"; point the already-imported jax back at
# CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
