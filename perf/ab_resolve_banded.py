"""Paired micro-A/B of the band-conditional color resolve (the last
round-3 lever with no on-TPU timing): flat resolve_colors vs
resolve_colors_banded on a REAL screen-index frame, interleaved A,B,A,B.

Usage: python perf/ab_resolve_banded.py [scene] [t] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import raymarch, reproject
from cpuvox_tpu.render.frame import Renderer

scene = sys.argv[1] if len(sys.argv) > 1 else "terrain2048"
tf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 12

lods = build_world(scene)
cfg = RenderConfig(width=1920, height=1080)
r = Renderer.create(lods, cfg)
cam = benchmark_camera(tf, r.device_world.dims, (1920, 1080))
_, rb_idx, (segs, ctxs, vps, cam_data, cam2) = r.render_device(cam)
n_td = segs[0].ray_count + segs[1].ray_count
tables = reproject.reproject_tables(segs, ctxs, vps, n_td)
t = {k: jnp.asarray(v) for k, v in tables.items()}
screen_idx = jax.jit(
    reproject.reproject_pallas,
    static_argnames=("width", "height", "interpret"))(
    rb_idx, t["tri_a"], t["tri_b"], t["tri_c"], t["ray_count"],
    t["ray_base"], t["active"], width=1920, height=1080)
screen_idx = jnp.asarray(np.asarray(screen_idx))
colors = r._wa.colors
sky = float(np.mean(np.asarray(screen_idx) <= 0))
print(f"{scene} t={tf}: sky/empty fraction {sky:.3f}", flush=True)

flat = jax.jit(raymarch.resolve_colors)
banded = jax.jit(raymarch.resolve_colors_banded)
a = np.asarray(flat(screen_idx, colors))
b = np.asarray(banded(screen_idx, colors))
print(f"banded vs flat pixels differ: {int((a != b).sum())}", flush=True)


def run(f):
    t0 = time.perf_counter()
    np.asarray(f(screen_idx, colors)).ravel()[0]
    return (time.perf_counter() - t0) * 1e3


run(flat)
run(banded)
ta, tb = [], []
for _ in range(reps):
    ta.append(run(flat))
    tb.append(run(banded))
ta_s, tb_s = sorted(ta), sorted(tb)
print(f"flat p50={ta_s[reps // 2]:.1f} ms  banded p50={tb_s[reps // 2]:.1f} ms"
      f"  (includes one ~25 ms tunnel round trip each)", flush=True)
