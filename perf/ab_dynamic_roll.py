"""Diagnose the r5 dynamic512 collapse (0.42 fps vs 10.5 in r3): paired
frame timings of the dynamic-terrain demo with kernel_roll on vs off in one
process.  The only default that touches the dense path this round is the
Pallas DDA roll (walk tile / cond / run-block all auto-gate on occupancy),
so if A≈B here the collapse was a tunnel dispatch-penalty window, not the
roll."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.models.dynamic_demo import DynamicTerrain
from cpuvox_tpu.render import camera as cm

size, wh, pairs = 512, (1280, 720), 6
out = {}
for roll in ("on", "off"):
    cfg = RenderConfig(width=wh[0], height=wh[1], kernel_roll=roll)
    d = DynamicTerrain.create(dims=(size, 128, size), config=cfg)
    dims = d.spec.dims
    cam = cm.Camera(position=(dims[0] * 0.5, dims[1] * 0.9, dims[2] * 0.22),
                    pitch_deg=22.0, yaw_deg=15.0, screen=wh)
    np.asarray(d.render_frame(0.0, cam)[0, 0])  # warm
    out[roll] = (d, cam)

ta, tb = [], []
for i in range(pairs):
    for roll, acc in (("on", ta), ("off", tb)):
        d, cam = out[roll]
        t0 = time.perf_counter()
        np.asarray(d.render_frame(0.1 * (i + 1), cam)[0, 0])
        acc.append((time.perf_counter() - t0) * 1e3)
print(f"dynamic{size} {wh[0]}x{wh[1]} pairs={pairs}:")
print(f"  roll=on  p50={sorted(ta)[len(ta) // 2]:.0f} ms")
print(f"  roll=off p50={sorted(tb)[len(tb) // 2]:.0f} ms")
