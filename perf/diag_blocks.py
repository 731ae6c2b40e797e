"""Size the fetch-slot-waste levers: per-128-lane-block gated emptiness.

The gated fetch pays GK x Rk gather slots per chunk (PERF_NOTES #15: ~22%
slot utilization on mill).  Two candidate levers:
  (a) block-cond fetch — skip the (GK, 128) fetch for 128-lane blocks with
      zero gated cells this chunk;
  (b) lane-count histogram — how much a smaller GK + rewinds could save.

This replays the DDA roll + occupancy-bit gate WITHOUT the rasterizer (no
frustum-window gate, no window-death), so late-chunk aliveness is an
OVERestimate on content where the window closes rays early (terrain); on
mill-class mostly-air content rays die by far-clip/out-of-world anyway and
the stats are representative.  Runs fine on the CPU backend.

Usage: JAX_PLATFORMS=cpu python perf/diag_blocks.py [scene] [WxH] [t] [chunk]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

if os.environ.get("DIAG_CPU", "1") == "1":
    # sitecustomize overrides jax_platforms programmatically; env alone is
    # not enough to avoid touching the (possibly down) TPU tunnel
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from cpuvox_tpu.bench.path import benchmark_camera  # noqa: E402
from cpuvox_tpu.config import RenderConfig  # noqa: E402
from cpuvox_tpu.render import raymarch as rm  # noqa: E402
from cpuvox_tpu.render.frame import Renderer  # noqa: E402
from cpuvox_tpu.render import segments as sg  # noqa: E402
from cpuvox_tpu.render import camera as cm  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
tf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
C = int(sys.argv[4]) if len(sys.argv) > 4 else 128
GK = 16
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h)
r = Renderer.create(lods, cfg)
wa = r._wa
dims = r.device_world.dims
cam = benchmark_camera(tf, dims, (w, h))
cam, cam_data = r.setup_camera(cam)
vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
segs = sg.build_segments(cam, vps)
ctxs = sg.build_segment_contexts(cam, segs, vps)
R = r.ray_capacity
static, dda, alive0, _ = rm.init_rays(cam_data, segs, ctxs, dims, fixed_size=R)
lodd = jnp.asarray(cam_data.lod_distances)
far = cam_data.far_clip
max_chunks = (3 * max(dims)) // C + 8


@jax.jit
def one_chunk(static, dda, march_alive):
    dda, march_alive, visits = rm._roll_chunk(
        dda, march_alive, static.dirs, lodd, far, dims, C)
    v_pos, v_ids, v_lod, v_valid = visits[:4]
    lodc = jnp.clip(v_lod, 0, 7)
    xc = v_pos[:, :, 0] >> v_lod
    zc = v_pos[:, :, 1] >> v_lod
    ci = (rm._small_lut(wa.col_base, lodc, 8)
          + xc * rm._small_lut(wa.grid_z, lodc, 8) + zc)
    ci_c = jnp.where(v_valid, ci, 0)
    rec0 = wa.rec_fwd[ci_c.ravel(), 0].reshape(ci.shape)
    gated = v_valid & (jnp.where(v_valid, rec0, 0) > 0)
    cnt = gated.astype(jnp.int32).sum(0)  # per-lane gated count (R,)
    return dda, march_alive, cnt, march_alive.astype(jnp.int32)


march_alive = alive0
tot_slots_cur = 0      # current scheme: GK x (alive rounded to 1024)
tot_slots_blk = 0      # block-cond: GK x 128 x blocks-with-any-gated-cell
tot_slots_blk2 = 0     # block-cond on a COMPACTED-alive prefix layout
tot_gated = 0
tot_lane_hist = np.zeros(GK + 2, np.int64)  # per-lane count histogram (capped)
chunks = 0
for i in range(max_chunks):
    dda, march_alive, cnt, alive_i = one_chunk(static, dda, march_alive)
    cnt = np.asarray(cnt)
    alive_np = np.asarray(alive_i).astype(bool)
    n_alive = int(alive_np.sum())
    if n_alive == 0:
        break
    chunks += 1
    gated_total = int(cnt.sum())
    tot_gated += gated_total
    rk = ((n_alive + 1023) // 1024) * 1024
    tot_slots_cur += GK * rk
    # block-cond in ORIGINAL order (stage-0 layout)
    nb = (R + 127) // 128
    blk = cnt[: nb * 128].reshape(nb, 128)
    nonempty = (blk.sum(1) > 0).sum()
    tot_slots_blk += GK * 128 * int(nonempty)
    # block-cond after compacting alive rays to a prefix (stable order)
    cnt_c = cnt[alive_np]
    nb2 = (len(cnt_c) + 127) // 128
    pad = np.zeros(nb2 * 128, cnt.dtype)
    pad[: len(cnt_c)] = cnt_c
    nonempty2 = (pad.reshape(nb2, 128).sum(1) > 0).sum()
    tot_slots_blk2 += GK * 128 * int(nonempty2)
    hist = np.bincount(np.minimum(cnt[alive_np], GK + 1),
                       minlength=GK + 2)
    tot_lane_hist[: len(hist)] += hist
    if i % 8 == 0:
        print(f"chunk {i:3d} alive {n_alive:6d} gated {gated_total:7d} "
              f"blocks {nb2:3d} nonempty {int(nonempty2):3d}", flush=True)

print(f"\nchunks replayed: {chunks}")
print(f"gated cells total:              {tot_gated:>12,}")
print(f"slots, current (GK x Rk):       {tot_slots_cur:>12,} "
      f"(util {tot_gated / max(tot_slots_cur,1):.1%})")
print(f"slots, block-cond (orig order): {tot_slots_blk:>12,} "
      f"(util {tot_gated / max(tot_slots_blk,1):.1%})")
print(f"slots, block-cond (compacted):  {tot_slots_blk2:>12,} "
      f"(util {tot_gated / max(tot_slots_blk2,1):.1%})")
print("per-lane gated-count histogram over (alive lane, chunk) pairs:")
tot_pairs = tot_lane_hist.sum()
for k in range(GK + 2):
    label = f">{GK}" if k == GK + 1 else str(k)
    print(f"  {label:>3}: {tot_lane_hist[k]:>12,} "
          f"({tot_lane_hist[k] / max(tot_pairs,1):.1%})")
