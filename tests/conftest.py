"""Test configuration: run on an 8-virtual-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding tests use XLA's
host-platform device virtualization (SURVEY.md §4: shard-count-invariant
transcripts are asserted on a virtual mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the 'axon' TPU platform and
# prepends it to jax_platforms; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: cold XLA compiles dominate test wall-time
# (~1s per program even on CPU); warm runs hit the cache.
from hypergreco_tpu import runtime  # noqa: E402

runtime.init()
