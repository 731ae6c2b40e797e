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


# per-tile nonemptiness + a synthetic supertile (8x8 tiles) emptiness map,
# to size a level-2 occupancy gate: tile-row fetches whose supertile is all
# empty could be skipped entirely
occ_np = np.asarray(wa.occ_tiles)
tile_nonempty = (occ_np[:, :4] != 0).any(axis=1)
tb = np.asarray(wa.tile_base)
tgz = np.asarray(wa.tile_gz)
super_of_tile = np.zeros(occ_np.shape[0], np.int64)
super_nonempty_l = []
sbase = [0] * 9
for L in range(8):
    gx_t = max(1, (dims[0] >> L) // 16)
    gz_t = max(1, (dims[2] >> L) // 8)
    n_t = gx_t * gz_t
    if tb[L] + n_t > occ_np.shape[0] and L > 0:
        n_t = 0
    sgx, sgz = (gx_t + 7) // 8, (gz_t + 7) // 8
    sbase[L + 1] = sbase[L] + sgx * sgz
    if n_t:
        t = np.arange(n_t)
        tx, tz = t // gz_t, t % gz_t
        sid = sbase[L] + (tx // 8) * sgz + (tz // 8)
        super_of_tile[tb[L]: tb[L] + n_t] = sid
        ne = np.zeros(sbase[L + 1] - sbase[L], bool)
        np.add.at(ne, sid - sbase[L], tile_nonempty[tb[L]: tb[L] + n_t])
        # np.add.at on bool ORs via add; rebuild properly:
        ne = np.zeros(sbase[L + 1] - sbase[L], np.int64)
        np.add.at(ne, sid - sbase[L],
                  tile_nonempty[tb[L]: tb[L] + n_t].astype(np.int64))
        super_nonempty_l.append(ne > 0)
    else:
        super_nonempty_l.append(np.zeros(sbase[L + 1] - sbase[L], bool))
super_nonempty = np.concatenate(super_nonempty_l) if super_nonempty_l else \
    np.zeros(1, bool)
tile_live = np.zeros(occ_np.shape[0], bool)
nz = np.arange(occ_np.shape[0])
tile_live = super_nonempty[super_of_tile[nz]]
tile_live_j = jnp.asarray(tile_live)


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
    # distinct-tile crossings (the stage-A tile-row fetch rows) and how many
    # lie in nonempty supertiles (a level-2 gate would fetch only those)
    ti = (rm._small_lut(wa.tile_base, lodc, 8)
          + (xc >> 4) * rm._small_lut(wa.tile_gz, lodc, 8) + (zc >> 3))
    ti_c = jnp.clip(jnp.where(v_valid, ti, -1), -1, wa.occ_tiles.shape[0] - 1)
    new = jnp.concatenate(
        [jnp.ones((1, ti.shape[1]), bool), ti_c[1:] != ti_c[:-1]], axis=0)
    crossing = v_valid & new
    n_cross = crossing.astype(jnp.int32).sum()
    live = tile_live_j[jnp.clip(ti_c, 0, None)]
    n_cross_live = (crossing & live).astype(jnp.int32).sum()
    return (dda, march_alive, cnt, march_alive.astype(jnp.int32),
            n_cross, n_cross_live)


def drain_slots(cnt_vec, max_groups):
    """Fetch slots for the MULTI-GROUP drain (raymarch gbody, block_fetch on):
    group g fetches GK x 128 for every 128-lane block containing a ray with
    more than g*GK gated cells; rays beyond max_groups*GK rewind (ignored
    here — same cells re-counted next chunk, a wash across orders)."""
    nb = (len(cnt_vec) + 127) // 128
    pad = np.zeros(nb * 128, cnt_vec.dtype)
    pad[: len(cnt_vec)] = cnt_vec
    blk_max = pad.reshape(nb, 128).max(1)
    slots = 0
    for g in range(max_groups):
        slots += GK * 128 * int((blk_max > g * GK).sum())
    return slots


march_alive = alive0
tot_slots_cur = 0      # current scheme: GK x (alive rounded to 1024)
tot_slots_blk = 0      # block-cond: GK x 128 x blocks-with-any-gated-cell
tot_slots_blk2 = 0     # block-cond on a COMPACTED-alive prefix layout
tot_drain_orig = 0     # multi-group drain slots, original stage-0 order
tot_drain_comp = 0     # ... alive-compacted prefix order
tot_drain_sort = 0     # ... per-chunk DESCENDING-count sorted (the candidate
#                        busy-sort lever: near-dense at block granularity)
tot_gated = 0
tot_lane_hist = np.zeros(GK + 2, np.int64)  # per-lane count histogram (capped)
tot_cross = 0
tot_cross_live = 0
chunks = 0
for i in range(max_chunks):
    (dda, march_alive, cnt, alive_i,
     n_cross, n_cross_live) = one_chunk(static, dda, march_alive)
    tot_cross += int(n_cross)
    tot_cross_live += int(n_cross_live)
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
    maxg = C // GK
    tot_drain_orig += drain_slots(cnt, maxg)
    tot_drain_comp += drain_slots(cnt_c, maxg)
    tot_drain_sort += drain_slots(np.sort(cnt_c)[::-1], maxg)
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
print(f"drain slots (multi-group, orig):{tot_drain_orig:>12,} "
      f"(util {tot_gated / max(tot_drain_orig,1):.1%})")
print(f"drain slots (compacted):        {tot_drain_comp:>12,} "
      f"(util {tot_gated / max(tot_drain_comp,1):.1%})")
print(f"drain slots (count-sorted):     {tot_drain_sort:>12,} "
      f"(util {tot_gated / max(tot_drain_sort,1):.1%} — the per-chunk "
      f"busy-sort lever's ceiling)")
print(f"tile crossings (stage-A rows):  {tot_cross:>12,}")
print(f"  in nonempty 8x8 supertiles:   {tot_cross_live:>12,} "
      f"({tot_cross_live / max(tot_cross,1):.1%} — a level-2 gate fetches "
      f"only these)")
print("per-lane gated-count histogram over (alive lane, chunk) pairs:")
tot_pairs = tot_lane_hist.sum()
for k in range(GK + 2):
    label = f">{GK}" if k == GK + 1 else str(k)
    print(f"  {label:>3}: {tot_lane_hist[k]:>12,} "
          f"({tot_lane_hist[k] / max(tot_pairs,1):.1%})")
