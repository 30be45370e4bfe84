"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote-compile tunnel at
1-4 minutes per distinct jit signature; JAX's persistent compilation
cache short-circuits repeat compiles to ~1 s (measured 23 s -> 1.5 s).
Call enable_compilation_cache() early in entry points (bench, driver
entry, validation scripts). Mirrors the role of the reference's
JITIFY/cudf kernel caches on the CUDA side.
"""

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotent; respects CUGRAPH_TPU_NO_COMPILE_CACHE=1 to disable."""
    if os.environ.get("CUGRAPH_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    # CPU backends: JAX's persistent cache stores AOT CPU executables
    # keyed WITHOUT the exact machine features; loading one compiled on a
    # different host SIGILLs (observed via the remote-compile service's
    # avx512/amx features vs this host). Only the TPU tunnel compiles are
    # worth caching anyway.
    if jax.default_backend() not in ("tpu", "axon"):
        return
    if cache_dir is None:
        cache_dir = os.environ.get(
            "CUGRAPH_TPU_COMPILE_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_cc"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
