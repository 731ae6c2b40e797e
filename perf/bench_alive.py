"""Alive-decay curve along the bench march (terrain2048 1080p, itd as in bench)."""
import sys, time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import device_init, raymarch
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.render import camera as cm, segments as sg
from cpuvox_tpu.ops import phase1_kernel as pk

lods = build_world("terrain2048")
cfg = RenderConfig(width=1920, height=1080, chunk_steps=32, max_march_chunks=192)
r = Renderer.create(lods, cfg)
cam, cam_data = r.setup_camera(benchmark_camera(0.35, r.device_world.dims, (1920, 1080)))
vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
segs = sg.build_segments(cam, vps)
ctxs = sg.build_segment_contexts(cam, segs, vps)
fp = device_init.build_frame_params(cam_data, segs, ctxs)
R = r.ray_capacity
itd = -1 if cam_data.inverse_element_iteration_direction else 1
dims = r.device_world.dims
MAXR = r.device_world.max_runs
C = 32; MC = 192
wa = r._wa

@jax.jit
def run(wa, fp):
    static, dda, alive0 = device_init.init_rays_device(fp, dims, R)
    G = R // 128
    P = ((max(1920,1080) + 7) // 8) * 8
    g128 = lambda x: x.reshape(G, 128)
    cam_y = jnp.broadcast_to(jnp.asarray(fp.cam_pos[1], jnp.float32), (R,))
    wmy = float(dims[1])
    consts = {"pb_p": g128(static.plane_bottom[:,0]), "pb_n": g128(static.plane_bottom[:,1]), "pb_w": g128(static.plane_bottom[:,2]),
              "pt_p": g128(static.plane_top[:,0]), "pt_n": g128(static.plane_top[:,1]), "pt_w": g128(static.plane_top[:,2]),
              "pd_p": g128(static.plane_dir[:,0]), "pd_n": g128(static.plane_dir[:,1]), "pd_w": g128(static.plane_dir[:,2]),
              "cam_y": g128(cam_y), "cam_y_norm": g128(cam_y / jnp.float32(wmy)),
              "orig_min": g128(static.orig_min), "orig_max": g128(static.orig_max)}
    state = {"nfp_min": g128(static.orig_min), "nfp_max": g128(static.orig_max),
             "fb_min": g128(static.orig_min.astype(jnp.float32) - 0.501),
             "fb_max": g128(static.orig_max.astype(jnp.float32) + 0.501),
             "fdir_min": jnp.zeros((G,128), jnp.float32), "fdir_max": jnp.zeros((G,128), jnp.float32),
             "f_active": jnp.zeros((G,128), jnp.int32), "alive": jnp.ones((G,128), jnp.int32)}
    raybuf = jnp.full((G, P, 128), -1, jnp.int32)
    counts = jnp.zeros(MC, jnp.int32)

    def cond(c):
        i, dda, alive, raybuf, state, counts = c
        return (i < MC) & (alive & (state["alive"].reshape(R) != 0)).any()

    def body(c):
        i, dda, alive, raybuf, state, counts = c
        march_alive = alive & (state["alive"].reshape(R) != 0)
        counts = counts.at[i].set(march_alive.sum())
        dda, march_alive, visits = raymarch._roll_chunk(dda, march_alive, static.dirs, fp.lod_distances, fp.far_clip, dims, C)
        v_pos, v_ids, v_lod, v_valid = visits[:4]
        lodc = jnp.clip(v_lod, 0, 7)
        ci = wa.col_base[lodc] + (v_pos[:,:,0] >> v_lod) * wa.grid_z[lodc] + (v_pos[:,:,1] >> v_lod)
        ci = jnp.where(v_valid, ci, 0)
        n_runs, run_off, color_off, cmin, cmax, runs_k = raymarch._fetch_columns(wa, ci, v_valid, itd, MAXR)
        to_cg = lambda x: x.reshape(C, G, 128)
        visits_d = {"ids0": to_cg(v_ids[:,:,0]), "ids1": to_cg(v_ids[:,:,1]), "lod": to_cg(v_lod), "valid": to_cg(v_valid.astype(jnp.int32))}
        meta = {"n_runs": to_cg(n_runs), "color_off": to_cg(color_off), "cmin": to_cg(cmin), "cmax": to_cg(cmax)}
        runs_r = runs_k.reshape(C, G, 128, MAXR).transpose(0, 3, 1, 2)
        raybuf, state = pk.rasterize_chunk(visits_d, meta, runs_r, consts, raybuf, state,
            C=C, MAXR=MAXR, BG=8, P=P, iteration_direction=itd, world_max_y=wmy, interpret=False)
        return i+1, dda, march_alive, raybuf, state, counts

    i, dda, alive, raybuf, state, counts = jax.lax.while_loop(cond, body, (jnp.int32(0), dda, alive0, raybuf, state, counts))
    return i, counts

i, counts = run(wa, fp)
counts = np.asarray(counts)
i = int(i)
print("chunks:", i, "R:", R)
print("alive per chunk:", counts[:i].tolist())
print("sum alive*C (visit rows):", int(counts[:i].sum()) * C, "vs dense:", R * C * i)
