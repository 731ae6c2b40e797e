"""Gather cost vs ROW WIDTH past 32B: does one 64B row beat two 32B rows?

If yes, the dense march can fetch PAIRED column records (two z-adjacent
columns per row — a z-stepping ray consumes both) and halve its row count.
Also times lax.sort at resolve scale (2M rows, 2 operands) to size a
sort-compacted non-sky resolve.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
NTAB = 4_200_000
NIDX = 3_400_000  # one terrain frame's useful visit count


def timed(name, fn, *args, n=5):
    f = jax.jit(fn)
    np.asarray(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:52s} {min(ts) * 1e3:9.2f} ms", flush=True)
    return min(ts)


for wint in (8, 16, 24, 32):
    tab = jnp.asarray(rng.integers(0, 2**31, (NTAB, wint)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, NTAB, (NIDX,)).astype(np.int32))
    t = timed(f"gather {NIDX} rows x {wint} int32 ({wint * 4}B)",
              lambda t_, i_: t_[i_][:, ::4].sum(), tab, idx)
    print(f"    -> {t / NIDX * 1e9:.1f} ns/row", flush=True)

# half the rows, twice the width (the paired-record shape)
tab16 = jnp.asarray(rng.integers(0, 2**31, (NTAB // 2, 16)).astype(np.int32))
idx_h = jnp.asarray(rng.integers(0, NTAB // 2, (NIDX // 2,)).astype(np.int32))
t = timed(f"gather {NIDX // 2} rows x 16 int32 (paired shape)",
          lambda t_, i_: t_[i_][:, ::4].sum(), tab16, idx_h)
print(f"    -> {t / (NIDX // 2) * 1e9:.1f} ns/row "
      f"({t / NIDX * 1e9:.1f} ns per LOGICAL 32B record)", flush=True)

# resolve-scale sort: (key, value) 2-operand, 2M rows
HW = 1920 * 1080
keys = jnp.asarray(rng.integers(0, 2, HW).astype(np.int32))  # sky bit
vals = jnp.asarray(np.arange(HW, dtype=np.int32))
timed("lax.sort 2.07M rows, 2 ops (sky-compaction cost)",
      lambda k, v: jax.lax.sort((k, v), num_keys=1)[1].sum(), keys, vals)
colors = jnp.asarray(rng.integers(0, 2**31, 46_000_000).astype(np.uint32))
sidx = jnp.asarray(rng.integers(0, 46_000_000, HW).astype(np.int32))
timed("flat resolve gather 2.07M rows (baseline)",
      lambda c, i: c[i].astype(jnp.uint32).sum(), colors, sidx)
for frac in (3, 6):
    k = HW // frac
    sk = jnp.asarray(rng.integers(0, 46_000_000, k).astype(np.int32))
    timed(f"resolve gather {k} rows (1/{frac} non-sky)",
          lambda c, i: c[i].astype(jnp.uint32).sum(), colors, sk)
