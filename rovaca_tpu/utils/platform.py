"""JAX platform selection helpers.

The TPU-tunnel environment installs a sitecustomize that force-updates
``jax_platforms`` to "axon,cpu" at interpreter start, which silently
overrides the JAX_PLATFORMS env var. These helpers re-assert the caller's
intent after jax import (config updates win over the sitecustomize as long
as no backend has been initialized yet).
"""

import os


def sync_platform_from_env():
    """Make jax_platforms match the JAX_PLATFORMS env var if set."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    try:
        import jax
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


def backend_name():
    """Default backend name, without importing jax when the env pins CPU.

    A jax import costs ~2s of interpreter start (plus the PJRT plugin
    load); pure-CPU runs through the native engine never need it."""
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return "cpu"
    import jax
    sync_platform_from_env()
    return jax.default_backend()


def force_cpu():
    """Pin this process to the CPU backend (workers, tests, evals)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sync_platform_from_env()
