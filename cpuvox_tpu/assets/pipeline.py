"""The full mesh->world conversion pipeline (the reference's "Convert" button,
UnityManager.cs:297-361 / SURVEY.md §3.2)."""
from __future__ import annotations

import time

from cpuvox_tpu.world import rle
from cpuvox_tpu.world.save import save_world

from .mesh import rescale
from .obj import import_obj
from .voxelizer import voxelize_mesh


def convert_obj_to_world(
    obj_path: str,
    max_dimension: int = 1024,
    swap_yz: bool = False,
    flips=(True, False, False),
    lod_levels: int = 6,
    save_path: str | None = None,
    verbose: bool = False,
    device: bool = False,
):
    """obj -> rescale -> voxelize -> LOD0 RLE build -> LOD chain [-> .world file].

    Returns the list of WorldLOD.  Mirrors the reference's stage order and its default
    X-flip (UnityManager.cs:304-334).

    device=True runs the voxelizer's per-candidate math as jitted TPU chunks
    (output-identical; requires JAX_ENABLE_X64=1 — use assets.convert_cli,
    which sets up the right process environment).
    """
    t0 = time.perf_counter()

    def tick(msg):
        nonlocal t0
        if verbose:
            t1 = time.perf_counter()
            print(f"{msg} ; {t1 - t0:.2f}s")
            t0 = t1

    mesh = import_obj(obj_path, swap_yz=swap_yz)
    tick(f"Loaded model; {mesh.vertex_count} vertices")
    dims = rescale(mesh, max_dimension, flips)
    tick(f"Rescaled to dims {dims}")
    if device:
        # soup AND LOD chain on device: only the packed tables cross the
        # (slow) device->host tunnel
        from cpuvox_tpu.world.rle_device import build_lod_chain_device

        from .voxelizer import voxelize_mesh_device

        xz_d, y_d, rgb_d, valid_d = voxelize_mesh_device(
            mesh, dims, return_device=True)
        tick(f"Voxelized on device: {xz_d.shape[0]} padded soup slots")
        lods = build_lod_chain_device(xz_d, y_d, rgb_d, valid_d, dims,
                                      lod_levels)
        tick(f"LOD chain on device: {[w.voxel_count for w in lods]} voxels")
    else:
        xz, y, rgb = voxelize_mesh(mesh, dims)
        tick(f"Voxelized: {xz.shape[0]} voxel samples")
        lod0 = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
        tick(f"LOD0: {lod0.voxel_count} voxels")
        lods = rle.build_lod_chain(lod0, lod_levels)
        tick(f"LOD chain 1..{lod_levels - 1}: "
             f"{[w.voxel_count for w in lods[1:]]} voxels")
    if save_path:
        save_world(save_path, lods)
        tick(f"Serialized world to {save_path}")
    return lods
