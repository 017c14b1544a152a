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


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: repeated CLI runs (and the Pallas
    kernels, which compile slowly through remote-compile tunnels) reuse
    compiled executables across processes."""
    import os
    import jax
    cache_dir = path or os.environ.get(
        "PAFUSE_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pafuse_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        pass


def commit_params(tree, mesh=None):
    """Device-commit a (possibly host-numpy) parameter pytree ONCE.

    Checkpoint loaders (``checkpoints.load_state`` /
    ``load_torch_checkpoint``) return host numpy trees; feeding those
    into a jitted call re-transfers EVERY leaf on EVERY call — through a
    tunneled backend that turned a 34 ms serving lift into 6.4 s
    (measured round 5, the live-demo wedge).  ``jax.device_put`` with
    the replicated sharding under a mesh (default placement otherwise)
    makes the transfer happen exactly once; already-committed arrays
    pass through free.
    """
    import jax
    if mesh is not None and int(mesh.devices.size) > 1:
        from pafuse_tpu.parallel.mesh import replicated
        return jax.device_put(tree, replicated(mesh))
    return jax.device_put(tree)


def ensure_backend():
    """Return jax.devices(), falling back to auto platform selection."""
    import jax
    enable_compilation_cache()
    try:
        return jax.devices()
    except RuntimeError as e:
        import warnings
        warnings.warn(f"Configured JAX backend unavailable ({e}); "
                      "falling back to automatic platform selection")
        jax.config.update("jax_platforms", "")
        return jax.devices()


def host_compute():
    """Context manager routing jnp ops to the in-process CPU backend.

    Host-side data preparation (dataset synthesis/normalization, per-sequence
    centering and windowing in the eval loop) reuses the same pure-jnp
    geometry kernels as the device path.  Under a tunneled TPU backend every
    one of those small per-sequence calls would otherwise pay a remote
    dispatch (and, for each new shape, a remote compile) of ~2-20 s — a
    1000-frame synthetic dataset took >40 min to "load".  Wrap host-side
    prep in this context so it runs on local CPU; device code is unaffected.
    """
    import contextlib
    import jax
    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()  # already on CPU
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:       # no separate CPU backend registered
        return contextlib.nullcontext()
    except Exception as e:     # pragma: no cover - unexpected lookup failure
        # Falling back silently would re-enable per-sequence dispatch to the
        # tunneled accelerator — the multi-minute pathology this helper
        # exists to prevent — so make the fallback loud.
        import warnings
        warnings.warn(f"host_compute: CPU backend lookup failed ({e!r}); "
                      "host-side prep will run on the default accelerator")
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def sync(x) -> float:
    """Force completion of the computation producing ``x`` and return a
    checksum scalar.

    ``jax.block_until_ready`` does NOT reliably synchronize through tunneled
    PJRT plugins (executions keep enqueueing asynchronously and "ready"
    resolves early, inflating naive throughput measurements by orders of
    magnitude).  A host readback of a value that data-depends on the result
    is the only honest barrier: this reduces ``x`` to one scalar on device
    and fetches it.  Use this in every timing loop.
    """
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(x)
    total = 0.0
    for leaf in leaves:
        total += float(jnp.sum(jnp.abs(jnp.asarray(leaf).astype(jnp.float32))))
    return total


def run_chunked_pipelined(fn, arrays, chunk: int):
    """Apply ``fn`` over fixed-size leading-axis chunks of ``arrays`` with a
    one-deep readback pipeline.

    Every chunk is padded to exactly ``chunk`` rows by repeating its last row
    (XLA compiles one executable per shape, so ragged tails must not leak to
    the device), ``fn(*chunks)`` dispatches the device work, and the previous
    chunk's result is read back while the device runs the current one — the
    same overlap pattern as ``evaluate.evaluate_sequences``.  Returns the
    unpadded concatenation of the results' leading axes.
    """
    import numpy as np
    n = arrays[0].shape[0]
    if n == 0:
        # surface the caller's bug clearly instead of np.concatenate([])'s
        # cryptic error after an empty loop
        raise ValueError("run_chunked_pipelined: empty leading axis")
    outs, pending = [], None
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        cur = stop - start
        pad = chunk - cur

        def padded(a):
            if pad == 0:
                return a[start:stop]
            reps = np.repeat(a[stop - 1:stop], pad, axis=0)
            return np.concatenate([a[start:stop], reps], axis=0)

        out = fn(*[padded(a) for a in arrays])
        if pending is not None:
            outs.append(np.asarray(pending[0])[:pending[1]])
        pending = (out, cur)
    if pending is not None:
        outs.append(np.asarray(pending[0])[:pending[1]])
    return np.concatenate(outs, axis=0)
