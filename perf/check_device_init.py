"""On-device proof that device ray init is bit-exact vs the host numpy init.

Runs on the REAL TPU (JAX_PLATFORMS unset): builds several worlds/cameras
(including rolled, pitched, and outside-world starts), runs
device_init.init_rays_device under jit on the chip, and compares every
RayStatic/DDAState field bit-for-bit against raymarch.init_rays (numpy,
IEEE).  Also renders full frames with host_init True vs False and diffs
pixels.  This is the evidence behind flipping RenderConfig.host_init to
False (utils/ieee.py supplies correctly-rounded divide/sqrt; PERF_NOTES 8).

Usage: python perf/check_device_init.py [scene ...]   (default: mill96 terrain256)
"""
import sys
import dataclasses

sys.path.insert(0, ".")
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm, device_init, raymarch, segments as sg
from cpuvox_tpu.render.frame import Renderer

scenes = sys.argv[1:] or ["mill96", "terrain256"]
W, H = 320, 240

fail = 0
for scene in scenes:
    lods = build_world(scene)
    cfg = RenderConfig(width=W, height=H, backend="xla")
    r = Renderer.create(lods, cfg)
    dims = r.device_world.dims
    R = r.ray_capacity
    cams = [benchmark_camera(t, dims, (W, H)) for t in (0.1, 0.35, 0.9, 0.95)]
    # outside-world start + looking up
    cams.append(cm.Camera(position=(-50.0, dims[1] * 0.6, -80.0), pitch_deg=10.0,
                          yaw_deg=30.0, screen=(W, H)))
    cams.append(cm.Camera(position=(dims[0] / 2, dims[1] * 0.8, dims[2] / 2),
                          pitch_deg=-25.0, yaw_deg=200.0, screen=(W, H)))
    for i, cam in enumerate(cams):
        cam, cam_data = r.setup_camera(cam)
        vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
        segs = sg.build_segments(cam, vps)
        ctxs = sg.build_segment_contexts(cam, segs, vps)
        h_static, h_dda, h_alive, _ = raymarch.init_rays(
            cam_data, segs, ctxs, dims, fixed_size=R)
        fp = device_init.build_frame_params(cam_data, segs, ctxs)
        d_static, d_dda, d_alive = jax.jit(
            device_init.init_rays_device, static_argnums=(1, 2))(fp, dims, R)
        bad = []
        for name in h_static._fields:
            a = np.asarray(getattr(h_static, name))
            b = np.asarray(getattr(d_static, name))
            n = int(np.sum(a.view(np.int32) != b.view(np.int32))
                    if a.dtype.itemsize == 4 else np.sum(a != b))
            if n:
                bad.append(f"static.{name}:{n}")
        for name in h_dda._fields:
            a = np.asarray(getattr(h_dda, name))
            b = np.asarray(getattr(d_dda, name))
            n = int(np.sum(a.view(np.int32) != b.view(np.int32))
                    if a.dtype.itemsize == 4 else np.sum(a != b))
            if n:
                bad.append(f"dda.{name}:{n}")
        n = int(np.sum(np.asarray(h_alive) != np.asarray(d_alive)))
        if n:
            bad.append(f"alive:{n}")
        tag = f"{scene} cam{i}"
        if bad:
            fail += 1
            print(f"FAIL {tag}: {', '.join(bad)}", flush=True)
        else:
            print(f"ok   {tag}: init bit-exact ({R} rays)", flush=True)

    # full-frame pixel diff host_init True vs False (pallas backend)
    r_h = Renderer.create(lods, dataclasses.replace(cfg, backend="pallas",
                                                    host_init=True))
    r_d = dataclasses.replace(r_h, config=dataclasses.replace(
        r_h.config, host_init=False))
    for i, cam in enumerate(cams):
        sh = np.asarray(r_h.render(cam))
        sd = np.asarray(r_d.render(cam))
        n = int(np.sum(sh != sd))
        if n:
            fail += 1
            print(f"FAIL {scene} cam{i}: frame host-vs-device init "
                  f"{n} pixels differ", flush=True)
        else:
            print(f"ok   {scene} cam{i}: frame identical", flush=True)

print("RESULT:", "FAIL" if fail else "PASS", flush=True)
sys.exit(1 if fail else 0)
