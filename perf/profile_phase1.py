"""Split one terrain2048 1080p frame into its phase costs on the real TPU.

Measures, with separate jits (all sharing the persistent cache):
  A. init_rays_device               (per-frame ray setup)
  B. roll-only march                (chunked DDA, no gather / raster)
  C. roll + column gather march     (adds the col_rec + runs fetch)
  D. full phase 1 (xla backend)
  E. full phase 1 (pallas backend)
  F. reproject + resolve            (phase 2)

Usage: python profile_phase1.py [scene] [WxH] [chunks]
"""
import os
import sys
import time

sys_path_root = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))
__import__("sys").path.insert(0, sys_path_root)

import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

print("cache:", enable_persistent_cache(), file=sys.stderr)

import jax
import jax.numpy as jnp

from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import device_init, raymarch, reproject
from cpuvox_tpu.render.frame import Renderer, _frame_fn

scene = sys.argv[1] if len(sys.argv) > 1 else "terrain2048"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
max_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 192
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, chunk_steps=32, max_march_chunks=max_chunks)
renderer = Renderer.create(lods, cfg)
dw = renderer.device_world
wa = renderer._wa
dims = dw.dims
print(f"world {dims} max_runs={dw.max_runs}", file=sys.stderr)

cam = benchmark_camera(0.35, dims, (w, h))
cam, cam_data = renderer.setup_camera(cam)
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render import segments as sg

vp_world = cm.vanishing_point_world(cam)
vp_screen = cm.vanishing_point_screen(cam, vp_world)
segs = sg.build_segments(cam, vp_screen)
ctxs = sg.build_segment_contexts(cam, segs, vp_screen)
fp = device_init.build_frame_params(cam_data, segs, ctxs)
R = renderer.ray_capacity
itd = -1 if cam_data.inverse_element_iteration_direction else 1
chunk = cfg.chunk_steps
MAXR = dw.max_runs
pixel_len = max(w, h)
print(f"R={R} itd={itd} chunk={chunk} max_chunks={max_chunks}", file=sys.stderr)


def hard_sync(out):
    # block_until_ready is unreliable through the axon tunnel; force a tiny
    # dependent device->host transfer instead
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timed(name, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    hard_sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        hard_sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:10.1f} ms")
    return out


# ---- A. init
init_jit = jax.jit(device_init.init_rays_device, static_argnames=("dims", "R"))
static, dda, alive0 = timed("A init_rays_device", init_jit, fp, dims, R)


# ---- B/C. roll / roll+gather
def roll_march(wa, static, dda, alive0, lodd, far_clip, do_gather: bool):
    def cond(c):
        i, dda, alive, acc = c
        return (i < max_chunks) & alive.any()

    def body(c):
        i, dda, alive, acc = c
        dda, alive, visits = raymarch._roll_chunk(
            dda, alive, static.dirs, lodd, far_clip, dims, chunk)
        v_pos, v_ids, v_lod, v_valid = visits[:4]
        if do_gather:
            lodc = jnp.clip(v_lod, 0, 7)
            ci = (wa.col_base[lodc]
                  + (v_pos[:, :, 0] >> v_lod) * wa.grid_z[lodc]
                  + (v_pos[:, :, 1] >> v_lod))
            ci = jnp.where(v_valid, ci, 0)
            n_runs, run_off, color_off, cmin, cmax, runs_k = \
                raymarch._fetch_columns(wa, ci, v_valid, itd, MAXR)
            acc = acc + n_runs.sum() + runs_k.sum() + color_off.sum() \
                + cmin.sum() + cmax.sum()
        else:
            acc = acc + v_pos.sum() + v_lod.sum()
        return i + 1, dda, alive, acc

    i, dda, alive, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), dda, alive0, jnp.int32(0)))
    return i, acc


roll_jit = jax.jit(roll_march, static_argnames=("do_gather",))
lodd = fp.lod_distances
fc = fp.far_clip
if os.environ.get("PROF_ONLY_E", "0") != "1":
    i_b, _ = timed("B roll only", roll_jit, wa, static, dda, alive0, lodd, fc,
                   do_gather=False)
    i_c, _ = timed("C roll+gather", roll_jit, wa, static, dda, alive0, lodd,
                   fc, do_gather=True)
    print(f"   chunks run: roll={int(i_b)} gather={int(i_c)}")

# ---- D/E. full phase 1
p1_xla = jax.jit(raymarch.phase1, static_argnames=(
    "iteration_direction", "chunk", "max_chunks", "max_runs", "dims", "pixel_len"))
rb_x = None
if os.environ.get("PROF_ONLY_E", "0") != "1":
    rb_x = timed("D phase1 XLA", p1_xla, wa, static, dda, alive0, lodd, fc,
                 jnp.float32(dims[1]), fp.cam_pos[1], iteration_direction=itd,
                 chunk=chunk, max_chunks=max_chunks, max_runs=MAXR, dims=dims,
                 pixel_len=pixel_len)

p1_pl = jax.jit(raymarch.phase1_pallas, static_argnames=(
    "world_max_y", "iteration_direction", "chunk", "max_chunks", "max_runs",
    "dims", "pixel_len", "block_groups", "interpret", "ablate_kernel",
    "ablate_pipeline"))
p1_pl = jax.jit(raymarch.phase1_pallas, static_argnames=(
    "world_max_y", "iteration_direction", "chunk", "max_chunks", "max_runs",
    "dims", "pixel_len", "block_groups", "interpret", "occupancy", "block_fetch",
    "ablate_kernel", "ablate_pipeline"))
rb_p = timed("E phase1 Pallas", p1_pl, wa, static, dda, alive0, lodd, fc,
             float(dims[1]), fp.cam_pos[1], iteration_direction=itd,
             chunk=chunk, max_chunks=max_chunks, max_runs=MAXR, dims=dims,
             pixel_len=pixel_len,
             occupancy=os.environ.get("PROF_OCC", "0") == "1",
             # env -> explicit static args here at the DEV-SCRIPT boundary;
             # library code takes these only as parameters
             ablate_kernel=os.environ.get("PHASE1_ABLATE", ""),
             ablate_pipeline=os.environ.get("PHASE1_ABLATE2", ""))

if rb_x is not None:
    diff = int(jnp.sum(rb_x != rb_p))
    print(f"   pallas vs xla raybuf mismatches: {diff}")

# ---- F. phase 2
n_td = segs[0].ray_count + segs[1].ray_count
tables = reproject.reproject_tables(segs, ctxs, vp_screen, n_td)


def phase2(rb, colors, ta, tb, tc, rc, rbase, act):
    screen_idx = reproject.reproject.__wrapped__(
        rb, ta, tb, tc, rc, rbase, act, width=w, height=h, skybox=jnp.int32(0))
    return raymarch.resolve_colors(screen_idx, colors)


p2_jit = jax.jit(phase2)
timed("F reproject+resolve", p2_jit, rb_p if rb_x is None else rb_x, wa.colors,
      jnp.asarray(tables["tri_a"]), jnp.asarray(tables["tri_b"]),
      jnp.asarray(tables["tri_c"]), jnp.asarray(tables["ray_count"]),
      jnp.asarray(tables["ray_base"]), jnp.asarray(tables["active"]))
