"""Standalone .obj -> .world converter with the device (TPU) voxelizer.

The device voxelizer needs jax_enable_x64 (its keep/drop-deciding reciprocal
rounds through f64 — see voxelizer.voxelize_mesh_device), which is a
process-global JAX mode the renderer must NOT run under — so conversion gets
its own process.  Run either directly:

    JAX_ENABLE_X64=1 python -m cpuvox_tpu.assets.convert_cli mill.obj out.world \
        --max-dim 2048

or via convert_subprocess(), which spawns the correctly-configured child.
This is the reference's multi-core conversion (one Task per core,
WordBuilder.cs:41-96) re-designed as device offload — the host here has one
core; the TPU is the parallel machine.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def convert_subprocess(obj_path: str, save_path: str, max_dimension: int = 1024,
                       lod_levels: int = 6, verbose: bool = True) -> None:
    """Run the device conversion in a child process with x64 enabled."""
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    args = [sys.executable, "-m", "cpuvox_tpu.assets.convert_cli", obj_path,
            save_path, "--max-dim", str(max_dimension),
            "--lod-levels", str(lod_levels)]
    if verbose:
        args.append("--verbose")
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(args, env=env, cwd=here)
    if proc.returncode != 0:
        raise RuntimeError(f"convert subprocess failed rc={proc.returncode}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("obj_path")
    ap.add_argument("save_path")
    ap.add_argument("--max-dim", type=int, default=1024)
    ap.add_argument("--lod-levels", type=int, default=6)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--host", action="store_true",
                    help="use the numpy voxelizer instead of the device one")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the device pipeline to the JAX CPU backend "
                         "(this environment's sitecustomize overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    ap.add_argument("--repeat", action="store_true",
                    help="convert twice and report both wall times: the first "
                         "pays this environment's per-process remote-executable "
                         "loads (1-100s of variance), the second is the "
                         "steady-state pipeline time")
    a = ap.parse_args(argv)

    if not a.host:
        import jax

        if a.cpu:
            jax.config.update("jax_platforms", "cpu")
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

        print(f"compile cache: {enable_persistent_cache()}", file=sys.stderr)
        print(f"backend: {jax.default_backend()} {jax.devices()}",
              file=sys.stderr)

    import time

    from cpuvox_tpu.assets.pipeline import convert_obj_to_world

    t0 = time.perf_counter()
    convert_obj_to_world(a.obj_path, max_dimension=a.max_dim,
                         lod_levels=a.lod_levels, save_path=a.save_path,
                         verbose=a.verbose, device=not a.host)
    t_cold = time.perf_counter() - t0
    print(f"convert wall: {t_cold:.1f}s", file=sys.stderr)
    if a.repeat:
        t0 = time.perf_counter()
        convert_obj_to_world(a.obj_path, max_dimension=a.max_dim,
                             lod_levels=a.lod_levels, save_path=a.save_path,
                             verbose=a.verbose, device=not a.host)
        print(f"convert wall (steady-state): {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
