"""Gather duplicate-penalty workarounds: redirect dup/dead indices to spread rows."""
import time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.render import raymarch, reproject

lods = build_world("terrain2048")
cfg = RenderConfig(width=1920, height=1080, chunk_steps=32, max_march_chunks=192)
r = Renderer.create(lods, cfg)
cam = benchmark_camera(0.35, r.device_world.dims, (1920, 1080))
_, rb_idx, (segs, ctxs, vps, cam_data, cam2) = r.render_device(cam)
n_td = segs[0].ray_count + segs[1].ray_count
tables = reproject.reproject_tables(segs, ctxs, vps, n_td)
t = {k: jnp.asarray(v) for k, v in tables.items()}
screen_idx = jax.jit(reproject.reproject_pallas, static_argnames=("width", "height", "interpret"))(
    rb_idx, t["tri_a"], t["tri_b"], t["tri_c"], t["ray_count"], t["ray_base"],
    t["active"], width=1920, height=1080)
screen_idx = jnp.asarray(np.asarray(screen_idx))
colors = r._wa.colors
print("sky fraction:", float(np.mean(np.asarray(screen_idx) == 0)))

def timed(name, fn, *args, n=4):
    f = jax.jit(fn)
    np.asarray(f(*args)).ravel()[0]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out[0, 0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms", flush=True)

H, W = 1080, 1920
iota = (jnp.arange(H*W, dtype=jnp.int32) % jnp.int32(65536)).reshape(H, W)
timed("gather sequential-ish idx (iota%64K)", lambda c, i: c[i], colors, iota)

def resolve_redirect(idx, c):
    lane = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
            + 128 * jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)) & 0xFFFF
    dup = idx <= 0
    idx2 = jnp.where(dup, lane, jnp.clip(idx, 0, c.shape[0] - 1))
    vals = c[idx2]
    return jnp.where(idx < 0, jnp.uint32(0xFFFF1493),
                     jnp.where(idx == 0, c[0], vals))

timed("resolve redirect sky->spread", resolve_redirect, screen_idx, colors)
timed("resolve plain (reference)", raymarch.resolve_colors, screen_idx, colors)
