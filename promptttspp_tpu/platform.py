"""Platform selection helper.

The TPU-tunnel plugin in some environments registers itself regardless of
``JAX_PLATFORMS``; applying the env var through jax.config restores the
standard behavior. Call before any backend initialization.
"""

from __future__ import annotations

import os


def apply_platform_env():
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
