"""Persistent XLA compilation cache.

First compile of the big vocoder program costs minutes on a tunneled TPU;
the persistent cache makes every later process start near-instant.
Call ``enable_compilation_cache()`` early in every CLI.
"""

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "EFFICIENTSPEECH_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
