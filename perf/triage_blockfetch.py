"""Triage the block_fetch on/off output divergence seen by ab_cfg on TPU
(round 4): render one frame under the XLA reference backend and under the
Pallas backend with block_fetch on and off, and report which side diverges
from the reference.  Optionally sweep several flythrough times.

Usage: python perf/triage_blockfetch.py [scene] [WxH] [t ...]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
ts = [float(x) for x in sys.argv[3:]] or [0.1]
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
base = RenderConfig(width=w, height=h)
r_xla = Renderer.create(lods, dataclasses.replace(base, backend="xla"))
dims = r_xla.device_world.dims

MATRIX = [
    ("bf=off lite=auto", dict(block_fetch="off")),
    ("bf=off lite=OFF ", dict(block_fetch="off", lite_records="off")),
    ("bf=on  lite=OFF ", dict(block_fetch="on", lite_records="off")),
    ("occ=OFF (dense)  ", dict(occupancy_gate="off")),
    ("bf=off lite=OFF c32", dict(block_fetch="off", lite_records="off",
                                 chunk_steps=32, max_march_chunks=160)),
]
variants = [(name, dataclasses.replace(
    r_xla, config=dataclasses.replace(base, **ov))) for name, ov in MATRIX]

for t in ts:
    cam = benchmark_camera(t, dims, (w, h))
    ref = np.asarray(r_xla.render(cam))
    for name, r in variants:
        img = np.asarray(r.render(cam))
        d = int((img != ref).sum())
        print(f"t={t}: {name} vs xla: {d} px", flush=True)
        if d:
            ys, xs = np.nonzero(img != ref)
            print(f"   first diffs at (y,x) "
                  f"{list(zip(ys[:5].tolist(), xs[:5].tolist()))} "
                  f"ref={[hex(v) for v in ref[ys[:3], xs[:3]]]} "
                  f"got={[hex(v) for v in img[ys[:3], xs[:3]]]}", flush=True)
