"""Paired A/B of adaptive lite records on vs off: interleave frames A,B,A,B...
in one process so tunnel-health drift hits both sides equally (same
methodology as ab_pair.py; PERF_NOTES finding 19).

Usage: python perf/ab_lite.py [scene] [WxH] [pairs]
A = lite records (device.build_device_world's adaptive tier), B = full records.
"""
import dataclasses
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
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, lite_records="auto")
r_a = Renderer.create(lods, cfg)
assert r_a.lite_runs_resolved > 0, "scene picked no lite tier"
r_b = dataclasses.replace(
    r_a, config=dataclasses.replace(cfg, lite_records="off"))
dims = r_a.device_world.dims
print(f"A: lite tier={r_a.device_world.lite_runs}  B: full records "
      f"(max_runs={r_a.device_world.max_runs})", flush=True)

cams = [benchmark_camera(0.1 + 0.8 * i / max(pairs - 1, 1), dims, (w, h))
        for i in range(pairs)]


def frame(r, cam):
    t0 = time.perf_counter()
    img = r.render(cam)
    np.asarray(img[0, 0])
    return time.perf_counter() - t0


frame(r_a, cams[0])  # warm both executables before any timing
frame(r_b, cams[0])
# correctness spot check on-device: lite and full must be pixel-identical
ia = np.asarray(r_a.render(cams[0]))
ib = np.asarray(r_b.render(cams[0]))
diff = int((ia != ib).sum())
print(f"spot frame lite-vs-full differing pixels: {diff}", flush=True)
assert diff == 0

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
print(f"  A(lite) p50={ta_s[n // 2]:.0f} ms   B(full) p50={tb_s[n // 2]:.0f} ms")
print(f"  paired delta (A-B) p50={dd_s[n // 2]:+.0f} ms  "
      f"wins A={sum(1 for d in dd if d < 0)} B={sum(1 for d in dd if d > 0)}")
