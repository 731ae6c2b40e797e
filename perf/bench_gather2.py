"""Gather cost model on TPU — HARD sync via host transfer (block_until_ready is
unreliable through the axon tunnel)."""
import time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
NTAB = 5_600_000
tab32 = jnp.asarray(rng.integers(0, 2**31, (NTAB, 32)).astype(np.int32))
tab8 = jnp.asarray(np.asarray(tab32[:, :8]))
tab1 = jnp.asarray(np.asarray(tab32[:, 0]))

def timed(name, fn, *args, n=3):
    f = jax.jit(fn)
    np.asarray(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms", flush=True)

# baseline dispatch+transfer latency
timed("noop scalar", lambda t: t[0, 0] * 2, tab32)

for NIDX in (295_000, 2_000_000, 9_400_000):
    idx = jnp.asarray(rng.integers(0, NTAB, NIDX).astype(np.int32))
    timed(f"gather {NIDX} rows x 1 int", lambda t, i: t[i].sum(), tab1, idx)
    timed(f"gather {NIDX} rows x 8 int", lambda t, i: t[i].sum(), tab8, idx)
    timed(f"gather {NIDX} rows x 32 int", lambda t, i: t[i].sum(), tab32, idx)
