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


_cache_enabled = False


def enable_persistent_compilation_cache():
    """Point jax at the persistent compile cache (kernel compiles dominate
    cold TPU runs — 20-60s each through remote tunnels). Costs a ~2s jax
    import, so device entry points call it lazily right before their
    first jit; pure-CPU/native-engine runs never pay it."""
    global _cache_enabled
    if _cache_enabled or os.environ.get("JAX_PLATFORMS",
                                        "").strip() == "cpu":
        return
    _cache_enabled = True
    import jax
    sync_platform_from_env()
    cache_dir = os.environ.get("ROVACA_JAX_CACHE",
                               os.path.expanduser("~/.cache/rovaca_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
