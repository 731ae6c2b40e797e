"""Phase-2 breakdown with hard sync: elementwise/index math vs gathers."""
import time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from cpuvox_tpu.render import reproject, raymarch

H, W, R, P = 1080, 1920, 9216, 1920
rng = np.random.default_rng(0)
raybuf = jnp.asarray(rng.integers(0, 46_000_000, (R, P)).astype(np.int32))
colors = jnp.asarray(rng.integers(0, 2**31, 46_000_000).astype(np.uint32))
tri_a = jnp.asarray(rng.random((4, 2)).astype(np.float32) * 500)
tri_b = jnp.asarray(rng.random((4, 2)).astype(np.float32) * 1000 + 500)
tri_c = jnp.asarray(rng.random((4, 2)).astype(np.float32) * 1000)
ray_count = jnp.asarray(np.array([2000, 2000, 2600, 2600], np.int32))
ray_base = jnp.asarray(np.array([0, 2000, 4000, 6600], np.int32))
active = jnp.asarray(np.ones(4, bool))

def timed(name, fn, *args, n=3):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,)*leaf.ndim])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,)*leaf.ndim])
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out

def full(rb, c, *t):
    idx = reproject.reproject.__wrapped__(rb, *t, width=W, height=H, skybox=jnp.int32(0))
    return raymarch.resolve_colors(idx, c)

timed("full phase2 (reproject+resolve)", full, raybuf, colors,
      tri_a, tri_b, tri_c, ray_count, ray_base, active)

def index_math(*t):
    # replicate reproject up to (ray_idx, texel)
    tri_a, tri_b, tri_c, ray_count, ray_base, active = t
    px = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :, None]
    py = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None, None]
    a = tri_a[None, None, :, :]
    v0 = (tri_b - tri_a)[None, None, :, :]
    v1 = (tri_c - tri_a)[None, None, :, :]
    v2x = px - a[..., 0]; v2y = py - a[..., 1]
    den = v0[..., 0]*v1[..., 1] - v1[..., 0]*v0[..., 1]
    den = jnp.where(den == 0, 1e-30, den)
    b_max = (v2x*v1[..., 1] - v1[..., 0]*v2y) / den
    b_min = (v0[..., 0]*v2y - v2x*v0[..., 1]) / den
    b_vp = 1.0 - b_max - b_min
    score = jnp.minimum(jnp.minimum(b_vp, b_max), b_min)
    score = jnp.where(active[None, None, :], score, -jnp.inf)
    inside = score >= 0.0
    pick_inside = jnp.argmax(inside.astype(jnp.int32) * (4 - jnp.arange(4))[None, None, :], axis=-1)
    pick_best = jnp.argmax(score, axis=-1)
    seg_id = jnp.where(inside.any(axis=-1), pick_inside, pick_best)
    bm = jnp.take_along_axis(b_max, seg_id[..., None], axis=-1)[..., 0]
    bn = jnp.take_along_axis(b_min, seg_id[..., None], axis=-1)[..., 0]
    denom = bm + bn
    x = jnp.where(denom != 0, bm/denom, 0.0)
    rc = ray_count[seg_id]
    ray_idx = jnp.clip(jnp.floor(x*rc.astype(jnp.float32)).astype(jnp.int32), 0, rc-1) + ray_base[seg_id]
    return ray_idx

ri = timed("index math only", index_math, tri_a, tri_b, tri_c, ray_count, ray_base, active)
ri = jnp.asarray(np.asarray(ri))
texel = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, W))
timed("raybuf[ri, texel] sample", lambda rb, i, t: rb[i, t], raybuf, ri, texel)
sidx = jnp.asarray(rng.integers(0, 46_000_000, (H, W)).astype(np.int32))
timed("colors[screen_idx] resolve", lambda c, i: c[i], colors, sidx)
