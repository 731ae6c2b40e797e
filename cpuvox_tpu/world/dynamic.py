"""On-device dynamic worlds: per-frame RLE column rebuilds in jnp.

The reference explicitly has no editing support (README.md:63); BASELINE.json config 4
("procedural heightmap terrain with per-frame RLE column rebuilds on-device") is new
TPU-native capability.  Design: a *surface world* — every column is one solid band of
constant depth — rebuilds its packed RLE arrays (the same layout DeviceWorld uses, see
render/device.py) entirely on device with fixed shapes, so `heights -> WorldArrays ->
rendered frame` is one jitted program and edits never touch the host.

Fixed-shape invariants (relaxations vs the static builder, kernel-safe):
- exactly 3 runs per column: [air above][solid band][air below]; air runs may have
  length 0 (the march treats them as no-ops, matching an absent run);
- per-column color capacity == band depth, so color offsets are col * depth exactly.

LOD chain: LOD L's band is the union of its 2^L x 2^L source bands (max top / min
bottom) — a conservative solid cover.  This is an approximation of the reference's
voxel-accurate downsample (World.cs:45-127), appropriate for per-frame rebuilds;
static worlds keep the exact chain.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.render.raymarch import WorldArrays


class SurfaceWorldSpec(NamedTuple):
    dims: tuple[int, int, int]
    depth: int  # solid band depth (voxels, constant per column)
    lod_levels: int


def _level_sizes(spec: SurfaceWorldSpec):
    X, Y, Z = spec.dims
    return [((X >> L) * (Z >> L)) for L in range(spec.lod_levels)]


@functools.partial(jax.jit, static_argnames=("spec",))
def build_surface_world_arrays(spec: SurfaceWorldSpec, top, colors):
    """heights -> packed world arrays, fully on device.

    top: (X, Z) int32 — top voxel y of each column's band (bottom = top - depth + 1,
    clamped at 0, making the band shallower at the floor).
    colors: (X, Z, depth) uint32 ARGB, top voxel first.
    Returns a WorldArrays pytree compatible with the renderer.
    """
    X, Y, Z = spec.dims
    depth = spec.depth
    L = spec.lod_levels
    sizes = _level_sizes(spec)

    col_base = np.zeros(8, np.int32)
    for i in range(1, L):
        col_base[i] = col_base[i - 1] + sizes[i - 1]
    col_base[L:] = col_base[L - 1]  # clamp overflow lods like DeviceWorld
    grid_z = np.array([max(Z >> min(i, L - 1), 1) for i in range(8)], np.int32)

    runs_parts, runs_rev_parts, colors_parts, rec_parts = [], [], [], []
    run_base = 0
    color_base = 1  # colors[0] = skybox

    top_l = top
    colors_l = colors
    for lvl in range(L):
        gx, gz = X >> lvl, Z >> lvl
        if lvl > 0:
            # union band + color subsample of the 2x2 parent block
            t = top_l.reshape(gx, 2, gz, 2)
            top_l = jnp.max(t, axis=(1, 3)) >> 1
            c = colors_l.reshape(gx, 2, gz, 2, depth)
            colors_l = c[:, 0, :, 0, :]
        n_cols = gx * gz
        h_l = Y >> lvl
        tl = jnp.clip(top_l.reshape(n_cols), 0, h_l - 1)
        bl = jnp.maximum(tl - depth + 1, 0)
        solid = tl - bl + 1
        air_above = ((-1 << 16) | ((h_l - 1) - tl)).astype(jnp.int32)
        air_below = ((-1 << 16) | bl).astype(jnp.int32)
        solid_r = solid.astype(jnp.int32)  # colors_index 0

        runs_parts.append(
            jnp.stack([air_above, solid_r, air_below], axis=1).reshape(-1))
        runs_rev_parts.append(
            jnp.stack([air_below, solid_r, air_above], axis=1).reshape(-1))
        colors_parts.append(colors_l.reshape(-1))

        vs = 1 << lvl
        ar = jnp.arange(n_cols, dtype=jnp.int32)
        rec = jnp.stack([
            jnp.full(n_cols, 3, jnp.int32),
            ar * 3 + run_base,
            ar * depth + color_base,
            (bl * vs).astype(jnp.int32),
            ((tl + 1) * vs).astype(jnp.int32),
            jnp.zeros(n_cols, jnp.int32),
            jnp.zeros(n_cols, jnp.int32),
            jnp.zeros(n_cols, jnp.int32),
        ], axis=1)
        rec_parts.append(rec)
        run_base += n_cols * 3
        color_base += n_cols * depth

    skybox = jnp.array([0xFF191919], jnp.uint32)
    pad = jnp.zeros(3, jnp.int32)
    return WorldArrays(
        col_base=jnp.asarray(col_base),
        grid_z=jnp.asarray(grid_z),
        col_rec=jnp.concatenate(rec_parts, axis=0),
        runs=jnp.concatenate(runs_parts + [pad]),
        runs_rev=jnp.concatenate(runs_rev_parts + [pad]),
        colors=jnp.concatenate([skybox, *colors_parts]),
    )


@functools.partial(jax.jit, static_argnames=("spec",))
def terrain_colors(spec: SurfaceWorldSpec, top):
    """Height-palette colors for a band world, (X, Z, depth) uint32 top-first."""
    X, Y, Z = spec.dims
    depth = spec.depth
    d = jnp.arange(depth, dtype=jnp.int32)[None, None, :]
    vy = jnp.maximum(top[:, :, None] - d, 0)
    t = jnp.clip(vy.astype(jnp.float32) / Y, 0.0, 1.0)
    knuth = np.uint32(2654435761)
    xz_hash = ((jnp.arange(X, dtype=jnp.uint32)[:, None, None] * knuth)
               ^ (jnp.arange(Z, dtype=jnp.uint32)[None, :, None] * np.uint32(40503)))
    noise = ((xz_hash + vy.astype(jnp.uint32) * 97) & 15).astype(jnp.float32) - 8.0
    r = jnp.clip(60 + t * 160 + noise, 0, 255).astype(jnp.uint32)
    g = jnp.clip(150 - t * 60 + noise, 0, 255).astype(jnp.uint32)
    b = jnp.clip(50 + t * 120 + noise, 0, 255).astype(jnp.uint32)
    return (jnp.uint32(255 << 24) | (r << 16) | (g << 8) | b)


@functools.partial(jax.jit, static_argnames=("spec",))
def animate_heights(spec: SurfaceWorldSpec, base_top, t):
    """Example per-frame edit: traveling waves over a base heightmap."""
    X, Y, Z = spec.dims
    xs = jnp.arange(X, dtype=jnp.float32)[:, None]
    zs = jnp.arange(Z, dtype=jnp.float32)[None, :]
    amp = max(2.0, Y * 0.05)
    wave = (jnp.sin(xs * 0.05 + t * 2.0) * jnp.cos(zs * 0.07 + t * 1.3) * amp)
    return jnp.clip(base_top + jnp.round(wave).astype(jnp.int32),
                    spec.depth, Y - 2)
