"""Split the steady-state 2048^3 conversion wall (44.3 s, queue_out/
convert2048_steady_r4.log) into voxelize / per-level LOD compute / per-level
fetch / host packing / serialize, to find the path to the <=30 s bar
(VERDICT r3 item 5; reference anecdote WordBuilder.cs:41-96 ~30 s on 4 cores).

NOTE: this profiles the LEGACY (cascade=False) chain internals — the flat
full-soup re-sort per level this split diagnosed.  Production now defaults to
the sums/counts cascade (rle_device._chain_cascade); its paired A/B against
this path is perf/ab_convert_cascade.py.

Run in an x64 process (like assets/convert_cli.py): JAX_ENABLE_X64=1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cpuvox_tpu.assets import mesh as mesh_mod  # noqa: E402
from cpuvox_tpu.assets import obj  # noqa: E402
from cpuvox_tpu.assets import voxelizer  # noqa: E402
from cpuvox_tpu.world import rle_device  # noqa: E402

MAXDIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N_REP = int(sys.argv[2]) if len(sys.argv) > 2 else 2

t0 = time.perf_counter()
m = obj.import_obj("/root/reference/datasets/mill.obj")
dims = mesh_mod.rescale(m, MAXDIM)
print(f"load+rescale {time.perf_counter() - t0:.2f}s  dims={dims}", flush=True)

for rep in range(N_REP):
    print(f"--- pass {rep} {'(cold: compiles)' if rep == 0 else '(steady)'}",
          flush=True)
    t0 = time.perf_counter()
    xz, y, rgbp, valid = voxelizer.voxelize_mesh_device(
        m, dims, return_device=True)
    jax.block_until_ready(valid)
    t_vox = time.perf_counter() - t0
    print(f"voxelize (device, blocked): {t_vox:.2f}s", flush=True)

    # re-run build_lod_chain_device's body with per-stage timers
    t0 = time.perf_counter()
    level = rle_device._level_fn()
    N = xz.shape[0]
    zbits = int(np.log2(dims[2]))
    x_raw = xz >> zbits
    z_raw = xz & jnp.int32(dims[2] - 1)
    ydim, zdim = jnp.int32(dims[1]), jnp.int32(dims[2])
    out0 = level(x_raw, z_raw, y, rgbp, valid, jnp.int32(0), ydim, zdim, N=N)
    jax.block_until_ready(out0["tab_col"])
    t_l0 = time.perf_counter() - t0
    print(f"LOD0 level() compute (blocked): {t_l0:.2f}s", flush=True)

    xz_d, y_d, colors0 = out0["xz_d"], out0["y_d"], out0["colors"]
    dval = jax.lax.iota(jnp.int32, N) < out0["n_dedupe"]
    x0 = xz_d >> zbits
    z0 = xz_d & jnp.int32(dims[2] - 1)
    c = colors0.astype(jnp.uint32)
    rgb_d = (((c >> 16) & 0xFF) | (((c >> 8) & 0xFF) << 8)
             | ((c & 0xFF) << 16)).astype(jnp.int32)

    t0 = time.perf_counter()
    outs = {1: level(x0, z0, y_d, rgb_d, dval, jnp.int32(1), ydim, zdim, N=N)}
    jax.block_until_ready(outs[1]["tab_col"])
    t_l1 = time.perf_counter() - t0
    print(f"LOD1 level() compute (blocked): {t_l1:.2f}s", flush=True)

    # fetch LOD0 with split timers (mirror _to_world_lod's three fetches)
    o = out0
    n_ded, n_runs, n_occ = (int(o["n_dedupe"]), int(o["n_runs_total"]),
                            int(o["n_occ"]))
    for nm, arr, n in (("colors", o["colors"], n_ded),
                       ("runs", o["runs3"], n_runs),
                       ("tab_col", o["tab_col"], n_occ)):
        t0 = time.perf_counter()
        host = rle_device._fetch(arr, n)
        dt = time.perf_counter() - t0
        mb = host.nbytes / 1e6
        print(f"LOD0 fetch {nm:8s}: {dt:6.2f}s  {mb:8.1f} MB "
              f"({mb / max(dt, 1e-9):6.1f} MB/s)", flush=True)
    t0 = time.perf_counter()
    w0 = rle_device._to_world_lod(o, dims, 0)
    print(f"LOD0 _to_world_lod total (incl refetch): "
          f"{time.perf_counter() - t0:.2f}s", flush=True)

    # remaining levels, serialized compute-then-fetch to expose each piece
    for L in range(1, 6):
        if L not in outs:
            t0 = time.perf_counter()
            outs[L] = level(x0, z0, y_d, rgb_d, dval, jnp.int32(L), ydim,
                            zdim, N=N)
            jax.block_until_ready(outs[L]["tab_col"])
            print(f"LOD{L} compute (blocked): {time.perf_counter() - t0:.2f}s",
                  flush=True)
        t0 = time.perf_counter()
        rle_device._to_world_lod(outs[L], dims, L)
        print(f"LOD{L} fetch+pack: {time.perf_counter() - t0:.2f}s",
              flush=True)
        outs[L] = None
