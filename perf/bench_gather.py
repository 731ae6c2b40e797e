"""Micro-benchmark: gather formulations for phase-2 reprojection on TPU.

out[y, x] = raybuf[ray_idx(y, x), texel(y, x)] where texel == y (TD segments),
plus the color resolve colors[idx] (arbitrary 1D lookup into a big table).
"""
import time

import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

H, W, R, P = 1080, 1920, 9216, 1920
NCOLORS = 46_000_000

rng = np.random.default_rng(0)
raybuf = jnp.asarray(rng.integers(0, NCOLORS, (R, P)).astype(np.int32))
raybuf_T = jnp.asarray(np.asarray(raybuf).T)  # (P, R)
# monotone-per-row ray indices like the real fan
u = (np.arange(W) + 0.5) / W
ri = (u[None, :] * (0.4 + 0.6 * (np.arange(H)[:, None] + 1) / H) * (R - 1))
ri = jnp.asarray(ri.astype(np.int32))
texel = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
colors = jnp.asarray(rng.integers(0, 2**31, NCOLORS).astype(np.uint32))
screen_idx = jnp.asarray(rng.integers(0, NCOLORS, (H, W)).astype(np.int32))


def timed(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.2f} ms")


timed("a) raybuf[ri, texel] 2D gather", lambda rb, i, t: rb[i, t],
      raybuf, ri, texel)
timed("b) flat 1D gather (ri*P + texel)",
      lambda rb, i, t: rb.reshape(-1)[i * P + t], raybuf, ri, texel)
timed("c) take_along_axis minor (P,R) axis=1",
      lambda rbt, i: jnp.take_along_axis(rbt[:H], i, axis=1), raybuf_T, ri)
timed("d) take_along_axis major (R,P) axis=0",
      lambda rb, i: jnp.take_along_axis(rb[:, :H], i.T, axis=0).T,
      raybuf, ri)
timed("e) colors[screen_idx] 1D lookup", lambda c, i: c[i],
      colors, screen_idx)
timed("f) colors lookup, flat+sorted-ish idx", lambda c, i: c[i],
      colors, jnp.sort(screen_idx.reshape(-1)).reshape(H, W))
