"""Isolated resolve_colors timing with REAL frame data (index distribution)."""
import time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer, _frame_fn
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

timed("resolve_colors(real idx)", raymarch.resolve_colors, screen_idx, colors)
rng = np.random.default_rng(0)
rnd = jnp.asarray(rng.integers(0, colors.shape[0], (1080, 1920)).astype(np.int32))
timed("resolve_colors(uniform idx)", raymarch.resolve_colors, rnd, colors)
sky = jnp.zeros((1080, 1920), jnp.int32)
timed("resolve_colors(all-zero idx)", raymarch.resolve_colors, sky, colors)
