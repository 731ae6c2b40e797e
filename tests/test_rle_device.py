"""Device LOD-chain builder vs the host chain — field-exact (world/rle_device).

Runs in an x64 child process (int64 dedupe keys need process-global x64,
which the test process must not enable)."""
import os
import subprocess
import sys


def test_device_chain_matches_host_subprocess():
    code = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import numpy as np
from cpuvox_tpu.world import rle
from cpuvox_tpu.world.rle_device import build_lod_chain_device

rng = np.random.default_rng(7)
dims = (64, 64, 64)
n = 60000
x = rng.integers(0, 64, n); z = rng.integers(0, 64, n); y = rng.integers(0, 64, n)
xz = x * 64 + z
r = rng.integers(0, 256, n).astype(np.uint8)
g = rng.integers(0, 256, n).astype(np.uint8)
b = rng.integers(0, 256, n).astype(np.uint8)

lod0 = rle.build_lod_from_voxels(dims, 0, xz, y, (r, g, b))
host = rle.build_lod_chain(lod0, 6)

N = 1 << 16
pad = N - n
xzp = np.concatenate([xz, np.zeros(pad, np.int64)]).astype(np.int32)
yp = np.concatenate([y, np.zeros(pad, np.int64)]).astype(np.int32)
rgbp = np.concatenate([
    r.astype(np.int32) | (g.astype(np.int32) << 8) | (b.astype(np.int32) << 16),
    np.zeros(pad, np.int32)])
valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
fields = ("col_offset", "col_runs", "col_color_offset", "col_min", "col_max",
          "runs", "colors")
for cascade in (True, False):
    dev = build_lod_chain_device(xzp, yp, rgbp, valid, dims, 6,
                                 cascade=cascade)
    for L in range(6):
        for f in fields:
            assert np.array_equal(getattr(host[L], f),
                                  getattr(dev[L], f)), (cascade, L, f)
        rle.validate_world(dev[L])

# empty-soup edge case
dev0 = build_lod_chain_device(np.zeros(128, np.int32), np.zeros(128, np.int32),
                              np.zeros(128, np.int32), np.zeros(128, bool),
                              (16, 16, 16), 3)
for w in dev0:
    assert w.colors.shape[0] == 0 and int(w.col_runs.sum()) == 0
print("device chain identical across 6 levels + empty case")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    proc = subprocess.run(
        [sys.executable, "-c", code.format(repo=repo)], env=env,
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "identical" in proc.stdout
