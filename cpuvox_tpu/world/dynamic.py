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

    NOTE (LOD deviation — module docstring): the LOD chain built here is a
    CONSERVATIVE UNION (max-top / min-bottom per 2^L block), not the reference's
    voxel-accurate downsample — so when the renderer's lod_distances engage
    LOD >= 1 on a dynamic world, distant geometry differs from what the static
    builder would produce.  Near-field (LOD0) content is exact.
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


# --------------------------------------------------------------- general edits
#
# The reference's World.SetVoxelColumn (World.cs:151) replaces one column's RLE
# data in place (unused by its app — editing is an explicit non-goal there,
# README.md:63).  The TPU-native equivalent below is a fully general editable
# world: every column owns a fixed-capacity record slot in the renderer's
# inline layout (render/device.py), so `set_voxel_column` is a jitted scatter
# and arbitrary occupancy/color edits stay on device.  LOD0-only by design
# (pair with lod_distances = inf like tests/scenes.frame_setup's default).


class EditableWorldSpec(NamedTuple):
    dims: tuple[int, int, int]
    max_runs: int  # per-column run capacity (K)
    col_colors: int  # per-column color capacity (>= max solid voxels/column)


class EditableWorld(NamedTuple):
    """Device pytree: dense per-column records + fixed-stride colors."""

    rec_fwd: jnp.ndarray  # (X*Z, RW) int32
    rec_rev: jnp.ndarray  # (X*Z, RW) int32
    colors: jnp.ndarray  # (1 + X*Z*col_colors,) uint32; [0] = skybox


def _rec_width(spec: EditableWorldSpec) -> int:
    # must mirror device.py's inline-record layout exactly: when the 16-bit
    # two-runs-per-word packing shrinks the padded row, the renderer's fetch
    # (raymarch._fetch_columns) unpacks — so editable records must pack too
    from cpuvox_tpu.render.device import packed_run_words

    return ((4 + packed_run_words(spec.max_runs) + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("spec",))
def column_from_occupancy(spec: EditableWorldSpec, occupancy, argb):
    """(Y,) bool occupancy + (Y,) uint32 colors -> one record row + color slot.

    Returns (row_fwd (RW,), row_rev (RW,), col_colors (col_colors,) uint32).
    Runs are emitted top-first (rle layout); colors top-first per solid voxel.
    Columns needing more than max_runs runs are NOT representable — keep edits
    within capacity (like any fixed-budget editable world).
    """
    X, Y, Z = spec.dims
    K = spec.max_runs
    RW = _rec_width(spec)
    occ = occupancy[::-1]  # top voxel first
    col = argb[::-1]

    first = jnp.concatenate([jnp.ones(1, bool), occ[1:] != occ[:-1]])
    run_id = jnp.cumsum(first.astype(jnp.int32)) - 1  # (Y,)
    n_runs = run_id[-1] + 1
    rid = jnp.minimum(run_id, K - 1)
    lengths = jnp.zeros(K, jnp.int32).at[rid].add(1)
    is_solid = jnp.zeros(K, bool).at[rid].max(occ)
    solid_before = jnp.cumsum(occ.astype(jnp.int32)) - occ.astype(jnp.int32)
    cidx = jnp.full(K, 1 << 20, jnp.int32).at[rid].min(
        jnp.where(occ, solid_before, 1 << 20))
    cidx = jnp.where(is_solid, cidx, 0)
    runs = jnp.where(is_solid, (cidx << 16) | lengths,
                     jnp.int32(-1 << 16) | lengths)
    kk = jnp.arange(K)
    runs = jnp.where(kk < n_runs, runs, 0)
    has_solid = occ.any()
    n_runs = jnp.where(has_solid, n_runs, 0)  # air-only column: 0 runs

    # reversed run order for the upward iteration direction
    rev_idx = jnp.where(kk < n_runs, n_runs - 1 - kk, kk)
    runs_rev = runs[jnp.clip(rev_idx, 0, K - 1)]
    runs_rev = jnp.where(kk < n_runs, runs_rev, 0)

    ys = jnp.arange(Y, dtype=jnp.int32)
    cmin = jnp.where(has_solid, jnp.min(jnp.where(occupancy, ys, 1 << 20)), 0)
    cmax = jnp.where(has_solid,
                     jnp.max(jnp.where(occupancy, ys + 1, -(1 << 20))), 0)

    # compact solid colors to the front of the column's color slot (top first)
    tgt = jnp.where(occ, solid_before, spec.col_colors - 1)
    slot = jnp.zeros(spec.col_colors, jnp.uint32)
    slot = slot.at[tgt].max(jnp.where(occ, col, 0))

    from cpuvox_tpu.render.device import packed_run_words

    rwords = packed_run_words(K)

    def row(rr):
        if rwords != K:
            # 16-bit packing (two runs per int32 word, air bit 0x8000): the
            # fetch reconstructs each solid run's color index from a cumsum of
            # solid lengths, so the explicit cidx in `rr` is dropped here
            length = rr & 0xFFFF
            half = jnp.where(rr < 0, 0x8000 | length, length)
            half = jnp.where(kk < n_runs, half, 0)
            half = jnp.concatenate(
                [half, jnp.zeros(2 * rwords - K, jnp.int32)])
            pairs = half.reshape(rwords, 2)
            rr = pairs[:, 0] | (pairs[:, 1] << 16)
        return jnp.concatenate([
            jnp.stack([n_runs, jnp.int32(0), cmin, cmax]), rr,
            jnp.zeros(RW - 4 - rr.shape[0], jnp.int32)])

    return row(runs), row(runs_rev), slot


@functools.partial(jax.jit, static_argnames=("spec",))
def set_voxel_column(spec: EditableWorldSpec, ew: EditableWorld, x, z,
                     occupancy, argb) -> EditableWorld:
    """Replace column (x, z) — the SetVoxelColumn equivalent, all on device."""
    X, Y, Z = spec.dims
    ci = x * Z + z
    row_f, row_r, slot = column_from_occupancy(spec, occupancy, argb)
    coff = 1 + ci * spec.col_colors
    row_f = row_f.at[1].set(coff)
    row_r = row_r.at[1].set(coff)
    return EditableWorld(
        rec_fwd=ew.rec_fwd.at[ci].set(row_f),
        rec_rev=ew.rec_rev.at[ci].set(row_r),
        colors=jax.lax.dynamic_update_slice(ew.colors, slot, (coff,)))


def _expand_lod0(w):
    """WorldLOD -> (col_index, y, argb) voxel soup (host numpy, setup only)."""
    X, Y, Z = w.dims
    runs = np.asarray(w.runs)
    col_runs = np.asarray(w.col_runs)
    col_off = np.asarray(w.col_offset).astype(np.int64)
    occupied = np.nonzero(col_runs > 0)[0]
    if occupied.size == 0:
        e = np.zeros(0, np.int64)
        return e, e.copy(), np.zeros(0, np.uint32)
    starts = col_off[occupied]
    n = runs.shape[0]
    colmark = np.zeros(n, np.int64)
    colmark[starts] = 1
    col_of = np.cumsum(colmark) - 1
    col_id = occupied[col_of]
    lengths = (runs & 0xFFFF).astype(np.int64)
    cum = np.cumsum(lengths)
    col_start_cum = (cum[starts] - lengths[starts])[col_of]
    before = np.concatenate([[0], cum[:-1]]) - col_start_cum
    y_top = (Y - 1) - before  # first (highest) voxel y of each run
    sel = np.nonzero((runs >= 0) & (lengths > 0))[0]
    reps = lengths[sel]
    rid = np.repeat(sel, reps)
    k = np.arange(int(reps.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(reps) - reps, reps)
    ys = y_top[rid] - k
    cols = col_id[rid]
    cpos = (np.asarray(w.col_color_offset).astype(np.int64)[cols]
            + (runs[rid] >> 16) + k)
    return cols, ys, np.asarray(w.colors)[cpos]


def editable_from_lod0(w, max_runs: int | None = None,
                       col_colors: int | None = None):
    """Static WorldLOD -> (spec, EditableWorld) with per-column fixed slots.

    KNOWN CAPABILITY CLIFF (v1): editable worlds are LOD0-ONLY — general edits
    cannot coexist with a LOD chain, so `editable_renderer` pins
    lod_distances=inf and far-field cost grows with world size.  Use the static
    builder (or the SurfaceWorld dynamic path, which does keep an approximate
    chain) for large worlds where LODs matter.
    """
    dims = w.dims
    spec_runs = max_runs or max(int(np.asarray(w.col_runs).max()), 1)
    X, Y, Z = dims
    n_cols = X * Z
    occ = np.zeros((n_cols, Y), bool)
    col = np.zeros((n_cols, Y), np.uint32)
    cols, ys, argb = _expand_lod0(w)
    occ[cols, ys] = True
    col[cols, ys] = argb
    ccap = col_colors or max(1, int(occ.sum(axis=1).max()))
    spec = EditableWorldSpec(dims=tuple(dims), max_runs=spec_runs,
                             col_colors=ccap)
    rows_f, rows_r, slots = jax.vmap(
        lambda o, c: column_from_occupancy(spec, o, c))(
        jnp.asarray(occ[:, :]), jnp.asarray(col))
    coffs = 1 + jnp.arange(n_cols, dtype=jnp.int32) * ccap
    rows_f = rows_f.at[:, 1].set(coffs)
    rows_r = rows_r.at[:, 1].set(coffs)
    colors = jnp.concatenate([
        jnp.array([0xFF191919], jnp.uint32), slots.reshape(-1)])
    return spec, EditableWorld(rec_fwd=rows_f, rec_rev=rows_r, colors=colors)


def editable_world_arrays(spec: EditableWorldSpec,
                          ew: EditableWorld) -> WorldArrays:
    """Renderer-compatible arrays (LOD0-only: pair with inf lod_distances)."""
    X, Y, Z = spec.dims
    return WorldArrays(
        col_base=jnp.zeros(8, jnp.int32),
        grid_z=jnp.full(8, Z, jnp.int32),
        col_rec=None, runs=None, runs_rev=None,
        colors=ew.colors,
        rec_fwd=ew.rec_fwd, rec_rev=ew.rec_rev)


def editable_renderer(spec: EditableWorldSpec, ew: EditableWorld, config=None):
    """A Renderer wired for an EditableWorld (LOD0-only lod distances).

    Swap `renderer._wa = editable_world_arrays(spec, new_ew)` after edits —
    shapes are fixed, so no recompilation happens.
    """
    import dataclasses as _dc

    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.render.frame import Renderer

    config = config or RenderConfig(width=640, height=360)

    @_dc.dataclass
    class _EditableDeviceWorld:
        dims: tuple
        max_runs: int
        max_col_colors: int
        _colors: object
        lite_runs: int = 0  # editable worlds never build lite records

        @property
        def colors(self):
            return self._colors

    r = Renderer.__new__(Renderer)
    r.device_world = _EditableDeviceWorld(spec.dims, spec.max_runs, 0,
                                          ew.colors)
    r.config = config
    far = float(2 * max(spec.dims))
    r.lod_distances = np.full(max(config.lod_levels, 1), 4 * far, np.float32)
    r.far_clip = far
    r._wa = editable_world_arrays(spec, ew)
    return r
