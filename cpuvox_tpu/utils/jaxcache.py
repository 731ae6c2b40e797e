"""Persistent XLA compilation cache (compiles via this environment's remote-compile
TPU tunnel take minutes; caching amortizes them across processes/rounds)."""
import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
