"""Quick frame-time A/B: render N frames along the bench path, print p50/mean.

Usage: python perf/ab_frame.py [scene] [WxH] [frames] [occ] [chunk] [gk] [verify]
  chunk 0 = auto (Renderer.march_params policy), gk 0 = auto.
  verify=1 renders one spot frame with the XLA backend too and reports the
  pixel diff (sweeps at new (chunk, gk) points should verify once — an
  under-provisioned march budget truncates identically-looking frames).
(Used for back-to-back comparisons of march-loop changes; absolute numbers
swing ~2x with tunnel health — compare runs taken within minutes.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402

from bench import build_world  # noqa: E402
from cpuvox_tpu.bench.path import benchmark_camera  # noqa: E402
from cpuvox_tpu.config import RenderConfig  # noqa: E402
from cpuvox_tpu.render.frame import Renderer  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
nf = int(sys.argv[3]) if len(sys.argv) > 3 else 8
occ = sys.argv[4] if len(sys.argv) > 4 else "auto"
ck = int(sys.argv[5]) if len(sys.argv) > 5 else 0
gk = int(sys.argv[6]) if len(sys.argv) > 6 else 0
verify = len(sys.argv) > 7 and sys.argv[7] == "1"
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, occupancy_gate=occ, chunk_steps=ck,
                   gated_group_cells=gk)
r = Renderer.create(lods, cfg)
dims = r.device_world.dims
rck, rmx = r.march_params

if verify:
    import dataclasses

    import jax.numpy as jnp

    cam_v = benchmark_camera(0.35, dims, (w, h))
    s_fast, _, _ = r.render_device(cam_v)
    ref = dataclasses.replace(
        r, config=dataclasses.replace(cfg, backend="xla"))
    s_ref, _, _ = ref.render_device(cam_v)
    diff = int(jnp.sum(s_fast != s_ref))
    print(f"verify vs xla: {diff} pixels differ", flush=True)
    if diff:
        sys.exit(1)

cams = [benchmark_camera(0.1 + 0.8 * i / max(nf - 1, 1), dims, (w, h))
        for i in range(nf)]
# warm
img = r.render(cams[0])
np.asarray(img[0, 0])
ts = []
for cam in cams:
    t0 = time.perf_counter()
    img = r.render(cam)
    np.asarray(img[0, 0])
    ts.append(time.perf_counter() - t0)
ts_ms = sorted(t * 1e3 for t in ts)
p50 = ts_ms[len(ts_ms) // 2]
print(f"{scene} {w}x{h} occ={occ} chunk={rck}(max {rmx}) gk={gk} frames={nf}: "
      f"p50={p50:.0f} ms mean={sum(ts_ms)/len(ts_ms):.0f} ms "
      f"min={ts_ms[0]:.0f} max={ts_ms[-1]:.0f}")
