"""JAX backend bootstrap with graceful fallback.

In some deployments ``JAX_PLATFORMS`` names a plugin backend (e.g. a
tunneled TPU registered by a sitecustomize) that may not be importable in
every process (PYTHONPATH overrides, subprocesses, notebooks).  Without a
fallback, every ``jax.devices()`` call raises ``RuntimeError: Backend '...'
is not in the list of known backends``.  ``ensure_backend()`` initializes
the configured backend and falls back to automatic selection when it is
unavailable, so the CLIs keep working everywhere.
"""

from __future__ import annotations


def ensure_backend():
    """Return jax.devices(), falling back to auto platform selection."""
    import jax
    try:
        return jax.devices()
    except RuntimeError as e:
        import warnings
        warnings.warn(f"Configured JAX backend unavailable ({e}); "
                      "falling back to automatic platform selection")
        jax.config.update("jax_platforms", "")
        return jax.devices()
