"""JAX runtime configuration shared by the CLI daemons.

Two environment facts drive this module (discovered on the target runtime):

- ``JAX_PLATFORMS`` in the environment is NOT honored here; backend choice
  must go through ``jax.config.update("jax_platforms", ...)`` before first
  use.
- First compilation of a receiver graph on the remote TPU takes ~80 s
  (tunnel round trips); the persistent compilation cache brings repeat
  daemon launches down to seconds, so every app enables it.
"""

from __future__ import annotations

import os

__all__ = ["configure_jax"]

_CACHE_DIR = os.path.expanduser("~/.cache/ka9q_sdr_tpu/jax")


def configure_jax(cpu: bool = False, cache: bool = True) -> None:
    """Call before any jax array work in an app entry point."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if cache:
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
