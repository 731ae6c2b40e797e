"""Paired A/B of two march-budget configs: interleave frames A,B,A,B... in one
process so tunnel-health drift hits both sides equally; report per-pair deltas.

Usage: python perf/ab_pair.py [scene] [WxH] [pairs] [ckA gkA ckB gkB]
       (ck 0 = auto policy, gk 0 = auto)

The paired p50 delta is trustworthy where absolute numbers are not (the
tunneled TPU swings ~2x run-to-run; PERF_NOTES caveat) — each pair renders the
same camera with both configs back-to-back.
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
pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 10
cka, gka, ckb, gkb = (int(x) for x in (sys.argv[4:8] or [0, 0, 32, 16]))
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg_a = RenderConfig(width=w, height=h, chunk_steps=cka, gated_group_cells=gka)
r_a = Renderer.create(lods, cfg_a)
r_b = dataclasses.replace(r_a, config=dataclasses.replace(
    cfg_a, chunk_steps=ckb, gated_group_cells=gkb))
dims = r_a.device_world.dims
print(f"A: chunk={r_a.march_params} gk={gka}  B: chunk={r_b.march_params} "
      f"gk={gkb}", flush=True)

cams = [benchmark_camera(0.1 + 0.8 * i / max(pairs - 1, 1), dims, (w, h))
        for i in range(pairs)]


def frame(r, cam):
    t0 = time.perf_counter()
    img = r.render(cam)
    np.asarray(img[0, 0])
    return time.perf_counter() - t0


frame(r_a, cams[0])  # warm both executables before any timing
frame(r_b, cams[0])
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
