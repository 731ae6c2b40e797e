"""Capture a device trace of one staged phase-1 march and print the top ops."""
import glob, os, sys, time
import numpy as np
from cpuvox_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from bench import build_world
from cpuvox_tpu.bench.path import benchmark_camera
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render.frame import Renderer

lods = build_world("terrain2048")
cfg = RenderConfig(width=1920, height=1080, chunk_steps=32, max_march_chunks=192)
r = Renderer.create(lods, cfg)
cam = benchmark_camera(0.35, r.device_world.dims, (1920, 1080))

def frame():
    s, _, _ = r.render_device(cam)
    np.asarray(s[0, 0])

frame()  # warm
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
