"""Is the gather slow because it's in a while_loop? Replicate march-loop shape."""
import time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
NTAB = 5_600_000
tab8 = jnp.asarray(rng.integers(0, 2**31, (NTAB, 8)).astype(np.int32))
C, R, ITERS = 32, 9216, 69
idx0 = jnp.asarray(rng.integers(0, NTAB, (C, R)).astype(np.int32))

def timed(name, fn, *args, n=3):
    f = jax.jit(fn)
    np.asarray(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)*1e3:9.2f} ms", flush=True)

def loop_gather(tab, idx):
    def body(c):
        i, idx, acc = c
        idx = (idx * 1664525 + 1013904223) % NTAB  # evolve indices
        rec = tab[idx.ravel()].reshape(C, R, 8)
        return i + 1, idx, acc + rec[..., 0].sum() + rec[..., 4].sum()
    def cond(c): return c[0] < ITERS
    return jax.lax.while_loop(cond, body, (jnp.int32(0), idx, jnp.int32(0)))[2]

timed(f"while_loop x{ITERS}: gather (C*R={C*R}) x8int", loop_gather, tab8, idx0)

def loop_nogather(tab, idx):
    def body(c):
        i, idx, acc = c
        idx = (idx * 1664525 + 1013904223) % NTAB
        return i + 1, idx, acc + idx.sum()
    def cond(c): return c[0] < ITERS
    return jax.lax.while_loop(cond, body, (jnp.int32(0), idx, jnp.int32(0)))[2]

timed(f"while_loop x{ITERS}: no gather", loop_nogather, tab8, idx0)

# one big gather of the same total rows
bigidx = jnp.asarray(rng.integers(0, NTAB, (ITERS * C * R,)).astype(np.int32))
timed("one gather 20.3M rows x8int", lambda t, i: t[i].sum(), tab8, bigidx)
