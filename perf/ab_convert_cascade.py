"""Paired A/B: LOD-chain cascade (sums/counts, ~4x shrinking per level) vs
the legacy full-soup re-sort at every level (round-3/4 path), on the real
2048^3 mill conversion.  The known wall is the legacy path's FLAT 3.1 s per
LOD1-5 level (PERF_NOTES r5, convert2048_steady_r5.log) — static-shape sorts
on the full ~22M-slot soup regardless of level size.

Also field-compares every level of the two chains on the real mesh (the
subprocess unit test covers random 64^3 worlds; this is the 2048^3 proof).

Run with JAX_ENABLE_X64=1 in the environment (sitecustomize imports jax
before an in-script setdefault could run).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from cpuvox_tpu.assets import mesh as mesh_mod  # noqa: E402
from cpuvox_tpu.assets import obj  # noqa: E402
from cpuvox_tpu.assets import voxelizer  # noqa: E402
from cpuvox_tpu.world.rle_device import build_lod_chain_device  # noqa: E402

MAXDIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N_REP = 2

m = obj.import_obj("/root/reference/datasets/mill.obj")
dims = mesh_mod.rescale(m, MAXDIM)
print(f"dims={dims}", flush=True)

t0 = time.perf_counter()
xz, y, rgbp, valid = voxelizer.voxelize_mesh_device(m, dims,
                                                    return_device=True)
jax.block_until_ready(valid)
print(f"voxelize (device, blocked): {time.perf_counter() - t0:.2f}s  "
      f"soup slots N={xz.shape[0]}", flush=True)

chains = {}
for cascade in (False, True):
    tag = "cascade" if cascade else "legacy"
    for rep in range(N_REP):
        t0 = time.perf_counter()
        worlds = build_lod_chain_device(xz, y, rgbp, valid, dims, 6,
                                        cascade=cascade)
        dt = time.perf_counter() - t0
        print(f"{tag} pass {rep} ({'cold' if rep == 0 else 'steady'}): "
              f"chain build+fetch {dt:.2f}s", flush=True)
    chains[tag] = worlds

fields = ("col_offset", "col_runs", "col_color_offset", "col_min", "col_max",
          "runs", "colors")
bad = 0
for L in range(6):
    for f in fields:
        a = getattr(chains["legacy"][L], f)
        b = getattr(chains["cascade"][L], f)
        if not np.array_equal(a, b):
            bad += 1
            print(f"MISMATCH L{L} {f}", flush=True)
print("chains identical across 6 levels" if bad == 0
      else f"{bad} field mismatches", flush=True)
