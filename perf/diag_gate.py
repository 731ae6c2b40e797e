"""Diagnose the occupancy/window gate: per-chunk, where do gather rows go?

Replays the march chunk-by-chunk through the XLA rasterizer (which exposes the
raster state the pallas kernel carries internally) and reports, per chunk:
alive rays, valid visits, bit=1 (nonempty tile bit), window-excluded, and the
final gated (fetched) count — split by LOD.

Usage: python perf/diag_gate.py [scene] [WxH] [t]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from cpuvox_tpu.bench.path import benchmark_camera  # noqa: E402
from cpuvox_tpu.config import RenderConfig  # noqa: E402
from cpuvox_tpu.render import raymarch as rm  # noqa: E402
from cpuvox_tpu.render.frame import Renderer  # noqa: E402
from cpuvox_tpu.render import device_init  # noqa: E402
from cpuvox_tpu.render import segments as sg  # noqa: E402
from cpuvox_tpu.render import camera as cm  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
tf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
w, h = (int(x) for x in wh.split("x"))
C = 32

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, chunk_steps=C, max_march_chunks=192)
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
itd = -1 if cam_data.inverse_element_iteration_direction else 1
MAXR = r.device_world.max_runs
wmy = float(dims[1])
cam_y = jnp.float32(cam_data.position[1])
lodd = jnp.asarray(cam_data.lod_distances)
far = cam_data.far_clip

rs = rm.RasterState(
    raybuf=jnp.full((R, max(w, h)), -1, jnp.int32),
    nfp_min=static.orig_min, nfp_max=static.orig_max,
    fb_min=static.orig_min.astype(jnp.float32) - 0.501,
    fb_max=static.orig_max.astype(jnp.float32) + 0.501,
    f_active=jnp.zeros(R, bool),
    fdir_min=jnp.zeros(R, jnp.float32), fdir_max=jnp.zeros(R, jnp.float32),
    alive=jnp.ones(R, bool))

consts = {"world_max_y": jnp.float32(wmy), "cam_y": cam_y,
          "cam_y_norm": cam_y / jnp.float32(wmy),
          "solid_min_y": None, "solid_max_y": None}
SOLID_MIN = r.device_world.solid_min_y
SOLID_MAX = r.device_world.solid_max_y
print(f"solid bounds: [{SOLID_MIN}, {SOLID_MAX}]  world box: [0, {wmy}]  "
      f"cam_y={float(cam_data.position[1]):.1f}", flush=True)


@jax.jit
def one_chunk(wa, static, dda, march_alive, rs):
    march_alive = march_alive & rs.alive
    dda, march_alive, visits = rm._roll_chunk(
        dda, march_alive, static.dirs, lodd, far, dims, C)
    v_pos, v_ids, v_lod, v_valid = visits[:4]

    lodc = jnp.clip(v_lod, 0, 7)
    xc = v_pos[:, :, 0] >> v_lod
    zc = v_pos[:, :, 1] >> v_lod
    ci = (rm._small_lut(wa.col_base, lodc, 8)
          + xc * rm._small_lut(wa.grid_z, lodc, 8) + zc)
    ci_c = jnp.where(v_valid, ci, 0)

    # exact per-cell occupancy bit (ground truth, no tile dedupe)
    rec = wa.rec_fwd[ci_c.ravel()].reshape(ci.shape + (-1,))
    nruns = jnp.where(v_valid, rec[..., 0], 0)
    bit = nruns > 0

    # exact tile cmin/cmax per step (ground truth)
    ti = (rm._small_lut(wa.tile_base, lodc, 8)
          + (xc >> 4) * rm._small_lut(wa.tile_gz, lodc, 8) + (zc >> 3))
    ti_c = jnp.clip(jnp.where(v_valid, ti, 0), 0, wa.occ_tiles.shape[0] - 1)
    trow = wa.occ_tiles[ti_c.ravel()].reshape(ti.shape + (-1,))
    tcmin = trow[..., 4].astype(jnp.float32)
    tcmax = trow[..., 5].astype(jnp.float32)

    # per-STEP window from chunk-start fdir state (untainted steps only)
    fact0 = rs.f_active
    dt = jnp.where(rs.fdir_max[None, :] > 0, v_ids[:, :, 1], v_ids[:, :, 0])
    db = jnp.where(rs.fdir_min[None, :] < 0, v_ids[:, :, 1], v_ids[:, :, 0])
    new_max = cam_y + rs.fdir_max[None, :] * dt
    new_min = cam_y + rs.fdir_min[None, :] * db
    marg = 1e-5 * (jnp.abs(new_max) + jnp.abs(new_min) + 1.0)
    cull_might = (new_min + marg > wmy) | (new_max - marg < 0.0)
    excl = (fact0[None, :] & ~cull_might
            & ((tcmin > new_max + marg) | (tcmax < new_min - marg)))
    trigger = (v_valid & bit & ~excl).astype(jnp.int32)
    taint = jnp.concatenate([jnp.zeros((1, R), jnp.int32),
                             jnp.cumsum(trigger[:-1], 0)], 0) > 0
    gated = v_valid & bit & (taint | ~excl)

    stats = {}
    stats["alive_in"] = march_alive.sum()
    stats["valid"] = v_valid.sum()
    stats["bit1"] = (v_valid & bit).sum()
    stats["excl_win"] = (v_valid & bit & excl).sum()
    stats["gated"] = gated.sum()
    stats["fact0"] = fact0.sum()
    for L in range(7):
        stats[f"gated_lod{L}"] = (gated & (v_lod == L)).sum()
    # run-count distribution of gated (fetched) cells — sizes a lite record
    for B in (2, 4, 6, 8, 12, 16):
        stats[f"gated_runs_le{B}"] = (gated & (nruns <= B)).sum()
    # per-chunk max gated count over rays (the group-drain / rewind bound)
    cnt = gated.astype(jnp.int32).sum(0)
    stats["max_per_ray"] = cnt.max()
    stats["rays_gt16"] = (cnt > 16).sum()
    stats["rays_1_16"] = ((cnt > 0) & (cnt <= 16)).sum()
    # advance the real rasterizer state (XLA path) so the next chunk's window
    # state is exact
    n_runs, run_off, color_off, cmin, cmax, runs_k = rm._fetch_columns(
        wa, ci_c, v_valid, itd, MAXR)

    # per-visit ground truth with the EVOLVING state: of the fetched cells, how
    # many does the rasterizer actually process vs skip_col (per-column window
    # miss)?  plus the would-be solid-bound kill (window bottom cleared the
    # world's max solid height with a monotone window)
    smax = jnp.float32(SOLID_MAX)
    smin = jnp.float32(SOLID_MIN)
    cnt0 = {k: jnp.int32(0) for k in
            ("proc", "skipc", "noact", "clip", "killsolid", "proc_lod0")}

    def raster_scan(carry, step_in):
        rs, cnt = carry
        pos_s, ids_s, lod_s, valid_s, nr_s, ro_s, co_s, cmin_s, cmax_s, rk_s \
            = step_in
        al = rs.alive & valid_s
        dist_top = jnp.where(rs.fdir_max > 0, ids_s[:, 1], ids_s[:, 0])
        dist_bot = jnp.where(rs.fdir_min < 0, ids_s[:, 1], ids_s[:, 0])
        nmax = cam_y + rs.fdir_max * dist_top
        nmin = cam_y + rs.fdir_min * dist_bot
        fa = rs.f_active
        ne = nr_s > 0
        skip = fa & ((cmin_s.astype(jnp.float32) > nmax)
                     | (cmax_s.astype(jnp.float32) < nmin))
        kill = al & fa & (((rs.fdir_min >= 0) & (nmin > smax))
                          | ((rs.fdir_max <= 0) & (nmax < smin)))
        proc = al & ne & ~skip
        cnt = {"proc": cnt["proc"] + proc.sum(),
               "proc_lod0": cnt["proc_lod0"] + (proc & (lod_s == 0)).sum(),
               "skipc": cnt["skipc"] + (al & ne & skip).sum(),
               "noact": cnt["noact"] + (al & ne & ~fa).sum(),
               "clip": cnt["clip"] + (proc & (ids_s[:, 0] > 2.0) & ~fa).sum(),
               "killsolid": cnt["killsolid"] + kill.sum()}
        rs2 = rm._rasterize_step(rs, step_in, wa, static, consts, itd, MAXR)
        return (rs2, cnt), None

    (rs, cnt), _ = jax.lax.scan(
        raster_scan, (rs, cnt0),
        (v_pos, v_ids, v_lod, v_valid, n_runs, run_off, color_off, cmin, cmax,
         runs_k))
    stats.update(cnt)
    return dda, march_alive, rs, stats


march_alive = alive0
tot = None
print("chunk alive_in  valid   bit1  exclW  gated   proc  skipc  killS | gated by lod")
for i in range(192):
    dda, march_alive, rs, st = one_chunk(wa, static, dda, march_alive, rs)
    st = {k: int(v) for k, v in st.items()}
    if tot is None:
        tot = dict(st)
    else:
        tot = {k: tot[k] + st[k] for k in st}
    lodstr = " ".join(str(st[f"gated_lod{L}"]) for L in range(7))
    print(f"{i:4d} {st['alive_in']:8d} {st['valid']:7d} {st['bit1']:6d} "
          f"{st['excl_win']:6d} {st['gated']:6d} {st['proc']:6d} "
          f"{st['skipc']:6d} {st['killsolid']:6d} | {lodstr}", flush=True)
    if st["alive_in"] == 0:
        break
print("TOTALS:", {k: v for k, v in tot.items()})
