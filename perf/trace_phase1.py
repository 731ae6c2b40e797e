"""Capture a device trace of one frame and print the top ops.

Usage: python perf/trace_phase1.py [scene] [occ auto|on|off] [WxH] [chunk]
"""
import glob, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer

scene = sys.argv[1] if len(sys.argv) > 1 else "terrain2048"
occ = sys.argv[2] if len(sys.argv) > 2 else "auto"
wh = sys.argv[3] if len(sys.argv) > 3 else "1920x1080"
chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 32
w, h = (int(x) for x in wh.split("x"))

lods = build_world(scene)
cfg = RenderConfig(width=w, height=h, chunk_steps=chunk, max_march_chunks=192,
                   occupancy_gate=occ)
r = Renderer.create(lods, cfg)
print(f"occ_on={r.occupancy_on}", file=sys.stderr)
cam = benchmark_camera(0.35, r.device_world.dims, (w, h))

def frame():
    s, _, _ = r.render_device(cam)
    np.asarray(s[0, 0])

frame()  # warm
t0 = time.perf_counter(); frame(); print(f"frame {time.perf_counter()-t0:.3f}s",
                                         file=sys.stderr)
outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    frame()
    frame()
print("trace captured", file=sys.stderr)

# parse: find xplane.pb and summarize op durations
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
print("xplanes:", files, file=sys.stderr)
data, _ = rtd.xspace_to_tool_data([files[0]], "framework_op_stats", {})
open("/tmp/opstats.csv", "wb").write(data if isinstance(data, bytes) else data.encode())
print("wrote /tmp/opstats.csv", file=sys.stderr)
