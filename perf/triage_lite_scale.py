"""Lite-divergence discriminator at reduced resolution: find the smallest
screen where the lite path diverges from XLA on this backend, then (if it
diverges compiled) run the SAME config through the interpret-mode kernel —
separating a Mosaic kernel codegen difference from an XLA orchestration bug.

Usage: python perf/triage_lite_scale.py [scene] [t]
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
tf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6

lods = build_world(scene)
first_bad = None
for w, h in ((320, 180), (640, 360), (960, 540), (1920, 1080)):
    base = RenderConfig(width=w, height=h)
    r_xla = Renderer.create(lods, dataclasses.replace(base, backend="xla"))
    cam = benchmark_camera(tf, r_xla.device_world.dims, (w, h))
    ref = np.asarray(r_xla.render(cam))
    r_lite = dataclasses.replace(r_xla, config=dataclasses.replace(
        base, lite_records="auto", block_fetch="off"))
    img = np.asarray(r_lite.render(cam))
    d = int((img != ref).sum())
    print(f"{w}x{h}: lite compiled vs xla: {d} px", flush=True)
    if d and first_bad is None:
        first_bad = (w, h, ref)
        break

if first_bad is None:
    print("no divergence at any tested resolution", flush=True)
else:
    w, h, ref = first_bad
    base = RenderConfig(width=w, height=h)
    r_xla = Renderer.create(lods, dataclasses.replace(base, backend="xla"))
    r_int = dataclasses.replace(r_xla, config=dataclasses.replace(
        base, lite_records="auto", block_fetch="off", pallas_interpret=True))
    cam = benchmark_camera(tf, r_xla.device_world.dims, (w, h))
    img = np.asarray(r_int.render(cam))
    d = int((img != ref).sum())
    print(f"{w}x{h}: lite INTERPRET vs xla: {d} px "
          f"(0 -> Mosaic kernel codegen; >0 -> XLA orchestration)",
          flush=True)
