"""Paired A/B of two arbitrary RenderConfig overrides: interleave frames
A,B,A,B... in one process so tunnel-health drift hits both sides equally
(PERF_NOTES finding 19 methodology; generalizes ab_pair.py / ab_lite.py).

Usage: python perf/ab_cfg.py scene WxH pairs 'JSON_A' 'JSON_B'
e.g.   python perf/ab_cfg.py terrain2048 1920x1080 8 '{}' '{"occupancy_gate": "on"}'

Prints each side's p50 and the paired delta, plus an on-device A-vs-B pixel
equality spot check (a config that changes OUTPUT is flagged loudly).
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ov_a = json.loads(sys.argv[4]) if len(sys.argv) > 4 else {}
ov_b = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {}
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
base = RenderConfig(width=w, height=h)
r_a = Renderer.create(lods, dataclasses.replace(base, **ov_a))
# overrides that change the DEVICE WORLD layout (not just the jit config)
# need a fresh build for the B leg — sharing r_a's world would silently
# benchmark the A-leg layout under the B-leg label
WORLD_FIELDS = {"argb_records", "skybox_rgb"}
if WORLD_FIELDS & (set(ov_a) | set(ov_b)):
    r_b = Renderer.create(lods, dataclasses.replace(base, **ov_b))
else:
    r_b = dataclasses.replace(r_a, config=dataclasses.replace(base, **ov_b))
dims = r_a.device_world.dims
print(f"A: {ov_a}  B: {ov_b}", flush=True)

cams = [benchmark_camera(0.1 + 0.8 * i / max(pairs - 1, 1), dims, (w, h))
        for i in range(pairs)]


def frame(r, cam):
    t0 = time.perf_counter()
    img = r.render(cam)
    np.asarray(img[0, 0])
    return time.perf_counter() - t0


frame(r_a, cams[0])  # warm both executables before any timing
frame(r_b, cams[0])
diff = int((np.asarray(r_a.render(cams[0]))
            != np.asarray(r_b.render(cams[0]))).sum())
print(f"spot frame A-vs-B differing pixels: {diff}"
      + ("  <-- OUTPUT CHANGED" if diff else ""), flush=True)

ta, tb, dd = [], [], []
for cam in cams:
    a = frame(r_a, cam)
    b = frame(r_b, cam)
    ta.append(a * 1e3)
    tb.append(b * 1e3)
    dd.append((a - b) * 1e3)
ta_s, tb_s, dd_s = sorted(ta), sorted(tb), sorted(dd)
n = len(dd_s)
print(f"{scene} {w}x{h} pairs={pairs}:")
print(f"  A p50={ta_s[n // 2]:.0f} ms   B p50={tb_s[n // 2]:.0f} ms")
print(f"  paired delta (A-B) p50={dd_s[n // 2]:+.0f} ms  "
      f"wins A={sum(1 for d in dd if d < 0)} B={sum(1 for d in dd if d > 0)}")
