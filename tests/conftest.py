"""Force an 8-virtual-device CPU platform before jax initializes.

This is the JAX-native multi-chip test harness (SURVEY.md §4): sharding
tests run against a fake 8-device mesh on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The TPU-tunnel plugin in this image ignores JAX_PLATFORMS; force via config
# (must happen before any backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
