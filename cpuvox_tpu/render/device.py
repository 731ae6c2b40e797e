"""Device-resident world: all LOD levels concatenated into flat HBM arrays.

The reference hands kernels a ``World*`` array of 6 LOD structs with pointers
(DrawSegmentRayJob.DrawContext, DrawSegmentRayJob.cs:729-734).  On TPU the whole chain
is five flat arrays + per-LOD base offsets, so a (position, lod) pair resolves to a
column with pure integer math and gathers:

    ci   = col_base[lod] + (x >> lod) * grid_z[lod] + (z >> lod)
    runs = runs_concat[col_offset[ci] + k],  k < col_runs[ci]
    rgba = colors_concat[col_color_offset[ci] + colors_index + u]

``colors_concat[0]`` is the skybox color; all color offsets are shifted by +1 so color
index 0 always resolves to skybox and -1 marks "unwritten" in raybuffers.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from cpuvox_tpu.utils.colors import SKYBOX
from cpuvox_tpu.world.rle import WorldLOD


@dataclasses.dataclass
class DeviceWorld:
    """Flat world arrays (numpy on host; pass through jnp.asarray / device_put)."""

    dims: tuple[int, int, int]
    lod_levels: int
    col_base: np.ndarray  # int32 [8]
    grid_z: np.ndarray  # int32 [8]  (Z >> lod per level)
    col_offset: np.ndarray  # int32 [total_cols] -> runs_concat
    col_runs: np.ndarray  # int32 [total_cols]
    col_color_offset: np.ndarray  # int32 [total_cols] -> colors_concat (skybox-shifted)
    col_min: np.ndarray  # int32 [total_cols]
    col_max: np.ndarray  # int32 [total_cols]
    runs: np.ndarray  # int32 [total_runs]
    colors: np.ndarray  # uint32 [1 + total_colors], [0] = skybox
    max_runs: int  # max col_runs over every LOD (bounds the kernel's run loop)


def build_device_world(lods: list[WorldLOD]) -> DeviceWorld:
    lod_levels = len(lods)
    col_base = np.zeros(8, np.int32)
    grid_z = np.ones(8, np.int32)
    col_offset, col_runs, col_cols, col_min, col_max = [], [], [], [], []
    runs_parts, colors_parts = [], []
    run_base = 0
    color_base = 1  # colors[0] = skybox
    for i, w in enumerate(lods):
        col_base[i] = sum(x.shape[0] for x in col_runs)
        grid_z[i] = w.dims[2] >> w.lod
        col_offset.append(w.col_offset + run_base)
        col_runs.append(w.col_runs)
        col_cols.append(w.col_color_offset + color_base)
        col_min.append(w.col_min)
        col_max.append(w.col_max)
        runs_parts.append(w.runs)
        colors_parts.append(w.colors)
        run_base += w.runs.shape[0]
        color_base += w.colors.shape[0]
    col_base[lod_levels:] = col_base[lod_levels - 1]  # clamp overflow lods
    grid_z[lod_levels:] = grid_z[lod_levels - 1]
    max_runs = int(max((int(w.col_runs.max()) if w.col_runs.size else 0) for w in lods))
    return DeviceWorld(
        dims=lods[0].dims,
        lod_levels=lod_levels,
        col_base=col_base,
        grid_z=grid_z,
        col_offset=np.concatenate(col_offset).astype(np.int32),
        col_runs=np.concatenate(col_runs).astype(np.int32),
        col_color_offset=np.concatenate(col_cols).astype(np.int32),
        col_min=np.concatenate(col_min).astype(np.int32),
        col_max=np.concatenate(col_max).astype(np.int32),
        runs=np.concatenate(runs_parts).astype(np.int32),
        colors=np.concatenate([[SKYBOX], *colors_parts]).astype(np.uint32),
        max_runs=max(max_runs, 1),
    )
