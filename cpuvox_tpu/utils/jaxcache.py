"""Persistent XLA compilation cache (compiles via this environment's remote-compile
TPU tunnel take minutes; caching amortizes them across processes/rounds).

The cache directory is namespaced by the backend's platform_version so AOT
executables compiled against one libtpu build can never be replayed against a
different one (the FAILED_PRECONDITION "libtpu version mismatch" failure mode)."""
import hashlib
import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    base = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        ver = jax.extend.backend.get_backend().platform_version
    except Exception:
        ver = jax.__version__
    tag = hashlib.sha1(ver.encode()).hexdigest()[:12]
    path = os.path.join(base, tag)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
