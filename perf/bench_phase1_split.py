"""Split phase-1 cost on the real TPU: full vs kernel-ablated variants.

Usage: python perf/bench_phase1_split.py [scene] [WxH] [occ] [chunk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

print("cache:", enable_persistent_cache(), file=sys.stderr)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from cpuvox_tpu.bench.path import benchmark_camera  # noqa: E402
from cpuvox_tpu.config import RenderConfig  # noqa: E402
from cpuvox_tpu.render import camera as cm  # noqa: E402
from cpuvox_tpu.render import raymarch as rm  # noqa: E402
from cpuvox_tpu.render import segments as sg  # noqa: E402
from cpuvox_tpu.render.frame import Renderer  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
occ = (sys.argv[3] if len(sys.argv) > 3 else "on") == "on"
chunk_arg = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # 0 = Renderer auto
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, chunk_steps=chunk_arg)
r = Renderer.create(lods, cfg)
wa = r._wa
dims = r.device_world.dims
cam = benchmark_camera(0.35, dims, (w, h))
cam, cam_data = r.setup_camera(cam)
vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
segs = sg.build_segments(cam, vps)
ctxs = sg.build_segment_contexts(cam, segs, vps)
R = r.ray_capacity
static, dda, alive0, _ = rm.init_rays(cam_data, segs, ctxs, dims, fixed_size=R)
itd = -1 if cam_data.inverse_element_iteration_direction else 1
MAXR = r.device_world.max_runs
# mirror the REAL frame wiring (render_device): the pre-r5 version of this
# script fell through to phase1_pallas's parameter defaults — walk tile 8,
# coverage cond on, rb 4, scan roll, chunk 32 AND block_fetch=True (the
# +456 ms loser) — so its splits measured a configuration no frame runs
chunk, max_chunks = r.march_params
occ = occ and r.occupancy_on
walk_tile = 16 if (occ and max(w, h) % 16 == 0) else 8
roll_on = getattr(cfg, "kernel_roll", "off") != "off" and cfg.lod_levels <= 7
lodd = jnp.asarray(cam_data.lod_distances)
if roll_on:
    lodd = lodd[:7]

p1 = jax.jit(rm.phase1_pallas, static_argnames=(
    "world_max_y", "iteration_direction", "chunk", "max_chunks", "max_runs",
    "dims", "pixel_len", "block_groups", "interpret", "max_col_colors",
    "skybox_argb", "occupancy", "block_fetch", "gated_cells", "lite_runs",
    "rb_cap", "drain_groups", "solid_min_y", "solid_max_y", "sweep_skip",
    "slot_gate", "walk_tile", "walk_cond", "roll_pallas",
    "ablate_kernel", "ablate_pipeline"))


def timed(tag, **kw):
    args = (wa, static, dda, alive0, lodd, cam_data.far_clip, float(dims[1]),
            cam_data.position[1])
    stat = dict(iteration_direction=itd, chunk=chunk, max_chunks=max_chunks,
                max_runs=MAXR, dims=dims, pixel_len=max(w, h), occupancy=occ,
                block_fetch=r.block_fetch_on,
                rb_cap=cfg.kernel_run_block or (8 if occ else 4),
                solid_min_y=r.solid_bounds[0], solid_max_y=r.solid_bounds[1],
                sweep_skip=getattr(cfg, "kernel_sweep_skip", "on") != "off",
                slot_gate=getattr(cfg, "kernel_slot_gate", "off") == "on",
                walk_tile=walk_tile,
                walk_cond=(getattr(cfg, "kernel_walk_cond", "auto") == "on"
                           or (getattr(cfg, "kernel_walk_cond", "auto")
                               == "auto" and not occ)),
                roll_pallas=roll_on)
    stat.update(kw)
    t0 = time.time()
    out = p1(*args, **stat)
    np.asarray(out[0, 0])
    compile_s = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = p1(*args, **stat)
        np.asarray(out[0, 0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: p50={np.median(ts) * 1e3:.1f}ms min={np.min(ts) * 1e3:.1f}ms "
          f"(first {compile_s:.1f}s)", file=sys.stderr)
    return out


timed("full       ")
timed("nowalk     ", ablate_kernel="nowalk")
timed("nosweep    ", ablate_kernel="nosweep")
if not occ:
    timed("nogather   ", ablate_pipeline="nogather")
    timed("nopallas   ", ablate_pipeline="nopallas")
else:
    # gated-path bisection ablations (WRONG output, timing only): nofetch
    # leaves roll + stage-A + kernel with zeroed records; noraster leaves
    # roll + stage-A + fetch with the kernel replaced by a no-op
    timed("nofetch    ", ablate_pipeline="nofetch")
    timed("noraster   ", ablate_pipeline="noraster")
