"""Measure the occupancy gate's effect on phase 1 in isolation (real TPU).

Usage: python perf/bench_occupancy.py [scene] [WxH] [frames]
Times renderer.render_device (full frame) and phase-1-only for occupancy on/off,
plus a roll-only march to bound the content-independent floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

print("cache:", enable_persistent_cache(), file=sys.stderr)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from cpuvox_tpu.bench.path import BENCH_CLIP_LENGTH, benchmark_camera  # noqa: E402
from cpuvox_tpu.config import RenderConfig  # noqa: E402
from cpuvox_tpu.render.frame import Renderer  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as bench_mod  # noqa: E402

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
wh = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 6
w, h = (int(x) for x in wh.split("x"))

lods = bench_mod.build_world(scene)


def sync(x):
    np.asarray(x[0, 0] if x.ndim > 1 else x[0])


def run(tag, cfg):
    r = Renderer.create(lods, cfg)
    print(f"{tag}: occ_on={r.occupancy_on} empty_frac="
          f"{getattr(r.device_world, 'empty_frac', None)}", file=sys.stderr)
    cams = [benchmark_camera(t, r.device_world.dims, (w, h))
            for t in np.linspace(0, BENCH_CLIP_LENGTH, n_frames)]
    sync(r.render_device(cams[0])[0])
    sync(r.render_device(cams[-1])[0])
    times = []
    for cam in cams:
        t0 = time.perf_counter()
        sync(r.render_device(cam)[0])
        times.append(time.perf_counter() - t0)
    print(f"{tag}: p50={np.median(times) * 1e3:.1f}ms "
          f"mean={np.mean(times) * 1e3:.1f}ms min={np.min(times) * 1e3:.1f}ms",
          file=sys.stderr)
    return r


base = RenderConfig(width=w, height=h,
                    chunk_steps=int(os.environ.get("BENCH_CHUNK", "32")),
                    max_march_chunks=int(os.environ.get("BENCH_MAX_CHUNKS",
                                                        "192")))
run("occ=off", dataclasses.replace(base, occupancy_gate="off"))
run("occ=on ", dataclasses.replace(base, occupancy_gate="on"))
