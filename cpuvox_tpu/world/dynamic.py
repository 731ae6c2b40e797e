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

LOD chain: LOD1 is EXACT by default (`SurfaceWorldSpec.exact_lod1`) — the
voxel-accurate downsample of the reference (World.cs:45-127: y >> 1 collapse +
color averaging over contributing source voxels), rebuilt per frame on device from
the band arrays (a 2x2 block of bands unions into at most 4 solid intervals, so a
fixed 9-run column capacity is provably sufficient; no overflow path exists).
LOD >= 2 remains a conservative union (max top / min bottom per 2^L block) — an
approximation appropriate for per-frame rebuilds; the deviation window vs the
static builder therefore starts at lod_distances[1], not lod_distances[0].
Static worlds keep the fully exact chain.
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
    exact_lod1: bool = True  # voxel-exact LOD1 (module docstring); False = union


_EXACT_LOD1_RUNS = 9  # union of 4 intervals: <= 4 solid runs + <= 5 air runs


def surface_world_max_runs(spec: SurfaceWorldSpec) -> int:
    """Per-column run capacity the renderer must size its fetch for."""
    return _EXACT_LOD1_RUNS if (spec.exact_lod1 and spec.lod_levels > 1) else 3


def _exact_lod1_color_cap(depth: int, h1: int) -> int:
    # each source band contributes <= floor(depth/2)+1 halved voxels; 4 sources
    return min(4 * (depth // 2 + 1), h1)


def _level_sizes(spec: SurfaceWorldSpec):
    X, Y, Z = spec.dims
    return [((X >> L) * (Z >> L)) for L in range(spec.lod_levels)]


def _runs_from_occupancy_batched(occ_t, K: int):
    """Batched (N, H) TOP-FIRST occupancy -> packed RLE runs.

    Returns (runs (N, K) int32, runs_rev (N, K), n_runs (N,)).  Solid runs pack
    (colors_index << 16) | length with colors_index = solid voxels above within
    the column (the static builder's contiguous color-block invariant,
    rle.build_lod_from_voxels); air runs pack (-1 << 16) | length.  Columns with
    more than K transitions are NOT representable — callers must size K from a
    proof (e.g. _EXACT_LOD1_RUNS for 4-interval unions).
    """
    N, H = occ_t.shape
    first = jnp.concatenate(
        [jnp.ones((N, 1), bool), occ_t[:, 1:] != occ_t[:, :-1]], axis=1)
    run_id = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    nr = run_id[:, -1] + 1
    rid = jnp.minimum(run_id, K - 1)
    rows = jnp.broadcast_to(jnp.arange(N)[:, None], (N, H))
    occ_i = occ_t.astype(jnp.int32)
    lengths = jnp.zeros((N, K), jnp.int32).at[rows, rid].add(1)
    is_solid = jnp.zeros((N, K), bool).at[rows, rid].max(occ_t)
    solid_before = jnp.cumsum(occ_i, axis=1) - occ_i
    BIG = jnp.int32(1 << 20)
    cidx = jnp.full((N, K), BIG, jnp.int32).at[rows, rid].min(
        jnp.where(occ_t, solid_before, BIG))
    cidx = jnp.where(is_solid, cidx, 0)
    runs = jnp.where(is_solid, (cidx << 16) | lengths,
                     jnp.int32(-1 << 16) | lengths)
    kk = jnp.arange(K)[None, :]
    has_solid = occ_t.any(axis=1)
    n_runs = jnp.where(has_solid, nr, 0)
    runs = jnp.where(kk < n_runs[:, None], runs, 0)
    rev_idx = jnp.clip(jnp.where(kk < n_runs[:, None],
                                 n_runs[:, None] - 1 - kk, kk), 0, K - 1)
    runs_rev = jnp.take_along_axis(runs, rev_idx, axis=1)
    runs_rev = jnp.where(kk < n_runs[:, None], runs_rev, 0)
    return runs, runs_rev, n_runs


def _exact_lod1_parts(dims, depth, tl0, bl0, colors):
    """Voxel-exact LOD1 tables from LOD0 band arrays, fully on device.

    Semantics match rle.downsample(lod0, 1) exactly: a LOD1 voxel (x, y, z) is
    solid iff any of the 2x2 source columns' band contains a y' with
    y' >> 1 == y, and its color channels are the floor-mean over ALL
    contributing source voxels (<= 8: 2 y-parities x 4 columns) — integer sums
    // count, alpha forced 255, identical to rle._dedupe_and_average.

    Returns (runs_flat, runs_rev_flat, colors_flat, n_runs, cmin, cmax,
    K1, cap1) with cmin/cmax already in world voxel units (scale 2).
    """
    X, Y, Z = dims
    gx1, gz1, h1 = X >> 1, Z >> 1, Y >> 1
    n1 = gx1 * gz1
    K1 = _EXACT_LOD1_RUNS
    cap1 = _exact_lod1_color_cap(depth, h1)

    y1 = jnp.arange(h1, dtype=jnp.int32)[None, None, :]
    occ1 = jnp.zeros((gx1, gz1, h1), bool)
    sum_r = jnp.zeros((gx1, gz1, h1), jnp.int32)
    sum_g = jnp.zeros((gx1, gz1, h1), jnp.int32)
    sum_b = jnp.zeros((gx1, gz1, h1), jnp.int32)
    cnt = jnp.zeros((gx1, gz1, h1), jnp.int32)
    for dx in (0, 1):
        for dz in (0, 1):
            t_i = tl0[dx::2, dz::2][:, :, None]
            b_i = bl0[dx::2, dz::2][:, :, None]
            occ1 = occ1 | ((y1 >= (b_i >> 1)) & (y1 <= (t_i >> 1)))
            c_i = colors[dx::2, dz::2]  # (gx1, gz1, depth) uint32, top-first
            for p in (0, 1):
                yp = 2 * y1 + p
                valid = (yp >= b_i) & (yp <= t_i)
                idx = jnp.clip(t_i - yp, 0, depth - 1)
                c = jnp.take_along_axis(c_i, idx.astype(jnp.int32), axis=2)
                sum_r += jnp.where(
                    valid, ((c >> 16) & 0xFF).astype(jnp.int32), 0)
                sum_g += jnp.where(
                    valid, ((c >> 8) & 0xFF).astype(jnp.int32), 0)
                sum_b += jnp.where(valid, (c & 0xFF).astype(jnp.int32), 0)
                cnt += valid.astype(jnp.int32)
    d = jnp.maximum(cnt, 1)
    argb1 = (jnp.uint32(255 << 24)
             | ((sum_r // d).astype(jnp.uint32) << 16)
             | ((sum_g // d).astype(jnp.uint32) << 8)
             | (sum_b // d).astype(jnp.uint32))

    # column extents in world voxel units (voxel_scale = 2)
    ys = y1[0]
    BIG = jnp.int32(1 << 20)
    has_solid = occ1.any(axis=2)
    cmin = jnp.where(has_solid,
                     jnp.min(jnp.where(occ1, ys, BIG), axis=2) * 2, 0)
    cmax = jnp.where(has_solid,
                     (jnp.max(jnp.where(occ1, ys + 1, -BIG), axis=2)) * 2, 0)

    # TOP-FIRST per-column layouts for runs + compacted color slots
    occ_t = occ1[:, :, ::-1].reshape(n1, h1)
    argb_t = jnp.where(occ1, argb1, 0)[:, :, ::-1].reshape(n1, h1)
    runs, runs_rev, n_runs = _runs_from_occupancy_batched(occ_t, K1)
    occ_i = occ_t.astype(jnp.int32)
    solid_before = jnp.cumsum(occ_i, axis=1) - occ_i
    tgt = jnp.where(occ_t, solid_before, cap1 - 1)
    rows = jnp.broadcast_to(jnp.arange(n1)[:, None], (n1, h1))
    slot = jnp.zeros((n1, cap1), jnp.uint32).at[rows, tgt].max(argb_t)
    return (runs.reshape(-1), runs_rev.reshape(-1), slot.reshape(-1),
            n_runs, cmin.reshape(n1), cmax.reshape(n1), K1, cap1)


@functools.partial(jax.jit, static_argnames=("spec",))
def build_surface_world_arrays(spec: SurfaceWorldSpec, top, colors):
    """heights -> packed world arrays, fully on device.

    top: (X, Z) int32 — top voxel y of each column's band (bottom = top - depth + 1,
    clamped at 0, making the band shallower at the floor).
    colors: (X, Z, depth) uint32 ARGB, top voxel first.
    Returns a WorldArrays pytree compatible with the renderer.

    NOTE (LOD deviation — module docstring): with the default
    spec.exact_lod1=True, LOD0 and LOD1 are voxel-exact vs the static builder
    (rle.downsample semantics, tested) and only LOD >= 2 is a CONSERVATIVE
    UNION (max-top / min-bottom per 2^L block) — so distant geometry beyond
    lod_distances[1] differs from what the static builder would produce.
    exact_lod1=False keeps the cheaper all-union chain (deviation from
    lod_distances[0]) with a fixed 3-run capacity.
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

    exact1 = spec.exact_lod1 and L > 1
    runs_parts, runs_rev_parts, colors_parts, rec_parts = [], [], [], []
    run_base = 0
    color_base = 1  # colors[0] = skybox

    top_l = top
    colors_l = colors
    tl0 = bl0 = None
    for lvl in range(L):
        gx, gz = X >> lvl, Z >> lvl
        if lvl > 0:
            # union band + color subsample of the 2x2 parent block (feeds the
            # conservative chain; at lvl 1 with exact_lod1 the EMITTED tables
            # come from _exact_lod1_parts instead, but the chain for lvl >= 2
            # continues from the union exactly as before)
            t = top_l.reshape(gx, 2, gz, 2)
            top_l = jnp.max(t, axis=(1, 3)) >> 1
            c = colors_l.reshape(gx, 2, gz, 2, depth)
            colors_l = c[:, 0, :, 0, :]
        n_cols = gx * gz
        h_l = Y >> lvl
        ar = jnp.arange(n_cols, dtype=jnp.int32)

        if lvl == 1 and exact1:
            (runs1, runs1_rev, colors1, n_runs1, cmin1, cmax1,
             K_l, cap_l) = _exact_lod1_parts((X, Y, Z), depth, tl0, bl0,
                                             colors)
            runs_parts.append(runs1)
            runs_rev_parts.append(runs1_rev)
            colors_parts.append(colors1)
            rec = jnp.stack([
                n_runs1,
                ar * K_l + run_base,
                ar * cap_l + color_base,
                cmin1, cmax1,
                jnp.zeros(n_cols, jnp.int32),
                jnp.zeros(n_cols, jnp.int32),
                jnp.zeros(n_cols, jnp.int32),
            ], axis=1)
            rec_parts.append(rec)
            run_base += n_cols * K_l
            color_base += n_cols * cap_l
            continue

        tl = jnp.clip(top_l.reshape(n_cols), 0, h_l - 1)
        bl = jnp.maximum(tl - depth + 1, 0)
        if lvl == 0:
            tl0, bl0 = tl.reshape(gx, gz), bl.reshape(gx, gz)
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
    # the renderer slices max_runs-wide run windows at every offset; pad the
    # tail so the LAST column's window stays in bounds
    pad = jnp.zeros(surface_world_max_runs(spec), jnp.int32)
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


def surface_renderer(spec: SurfaceWorldSpec, top, colors, config=None):
    """A Renderer wired for a dynamic surface world.

    Swap `renderer._wa = build_surface_world_arrays(spec, new_top, new_colors)`
    after edits — shapes are fixed, so no recompilation happens (this is what
    models/dynamic_demo.py does per frame).
    """
    import dataclasses as _dc

    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.render.frame import Renderer

    config = config or RenderConfig(width=640, height=360)
    wa = build_surface_world_arrays(spec, top, colors)

    @_dc.dataclass
    class _SurfaceDeviceWorld:
        """Just enough DeviceWorld surface for Renderer."""

        dims: tuple
        max_runs: int
        _wa: object
        max_col_colors: int = 0  # split layout (color-index mode)
        lite_runs: int = 0  # dynamic worlds never build lite records

        @property
        def colors(self):
            return self._wa.colors

    r = Renderer.__new__(Renderer)
    r.device_world = _SurfaceDeviceWorld(
        spec.dims, surface_world_max_runs(spec), wa)
    r.config = config
    r.lod_distances = None
    r.far_clip = 0.0
    r._wa = wa
    return r


# --------------------------------------------------------------- general edits
#
# The reference's World.SetVoxelColumn (World.cs:151) replaces one column's RLE
# data in place (unused by its app — editing is an explicit non-goal there,
# README.md:63).  The TPU-native equivalent below is a fully general editable
# world: every column owns a fixed-capacity record slot in the renderer's
# inline layout (render/device.py), so `set_voxel_column` is a jitted scatter
# and arbitrary occupancy/color edits stay on device.  Live edits render
# LOD0-only (lod_distances = inf); `editable_chain_snapshot` below rebuilds a
# voxel-exact LOD chain on device whenever the far field should catch up.


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

    LIVE edits are LOD0-only (`editable_renderer` pins lod_distances=inf, so
    far-field cost grows with world size); for large worlds render through
    `editable_chain_renderer`, which snapshots a voxel-EXACT on-device LOD
    chain (deferred-rebuild model, see editable_chain_snapshot below).
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
    shapes are fixed, so no recompilation happens.  For LOD-chain rendering of
    editable content see editable_chain_renderer (deferred exact rebuild).
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


# ------------------------------------- deferred exact LOD chain for edit worlds
#
# Removes the LOD0-only cliff above: `editable_chain_snapshot` rebuilds a FULL
# voxel-exact LOD chain from an EditableWorld entirely on device (no x64 mode —
# unlike world/rle_device.py's soup builder, this path runs in the renderer
# process).  Edits stay instant on the LOD0 records; call the rebuild whenever
# the far field should catch up (the deferred-rebuild model).  Exactness note:
# the static builder (rle.downsample) colors every LOD-L voxel with the FLAT
# floor-mean over its 2^L-cube of LOD0 source voxels — NOT a mean of means — so
# the pyramid below carries channel SUMS + COUNTS and divides only at emission.


@functools.partial(jax.jit, static_argnames=("spec",))
def _editable_dense(spec: EditableWorldSpec, ew: EditableWorld):
    """EditableWorld records -> dense (N, Y) TOP-FIRST occupancy + ARGB."""
    from cpuvox_tpu.render.device import packed_run_words

    X, Y, Z = spec.dims
    N, K = X * Z, spec.max_runs
    rec = ew.rec_fwd
    n_runs = rec[:, 0]
    rwords = packed_run_words(K)
    if rwords != K:
        words = rec[:, 4:4 + rwords]
        lo = words & 0xFFFF
        hi = jax.lax.shift_right_logical(words, 16)
        halves = jnp.stack([lo, hi], axis=-1).reshape(N, 2 * rwords)[:, :K]
        length = halves & 0x7FFF
        air = (halves & 0x8000) != 0
    else:
        words = rec[:, 4:4 + K]
        length = words & 0xFFFF
        air = words < 0
    kk = jnp.arange(K)[None, :]
    valid_k = kk < n_runs[:, None]
    lengths = jnp.where(valid_k, length, 0)
    is_solid = valid_k & ~air & (lengths > 0)
    start = jnp.cumsum(lengths, axis=1) - lengths  # top-first run start index

    rows_k = jnp.broadcast_to(jnp.arange(N)[:, None], (N, K))
    marks = jnp.zeros((N, Y + 1), jnp.int32).at[
        rows_k, jnp.clip(start, 0, Y)].add(valid_k.astype(jnp.int32))
    rid = jnp.cumsum(marks[:, :Y], axis=1) - 1
    occ_t = (jnp.take_along_axis(is_solid, jnp.clip(rid, 0, K - 1), axis=1)
             & (rid >= 0))
    occ_i = occ_t.astype(jnp.int32)
    solid_before = jnp.cumsum(occ_i, axis=1) - occ_i
    slot = ew.colors[1:].reshape(N, spec.col_colors)
    argb_t = jnp.where(
        occ_t,
        jnp.take_along_axis(
            slot, jnp.clip(solid_before, 0, spec.col_colors - 1), axis=1),
        jnp.uint32(0))
    return occ_t, argb_t


def _chain_pyramid(dims, occ_t, argb_t, L):
    """Per-level (occ, sum_r, sum_g, sum_b, cnt) dense pyramids, y-ASCENDING
    (X>>l, Z>>l, Y>>l) layout; sums/counts aggregate LOD0 sources exactly."""
    X, Y, Z = dims
    occ0 = occ_t[:, ::-1].reshape(X, Z, Y)
    argb0 = argb_t[:, ::-1].reshape(X, Z, Y)
    cnt = occ0.astype(jnp.int32)
    sum_r = jnp.where(occ0, ((argb0 >> 16) & 0xFF).astype(jnp.int32), 0)
    sum_g = jnp.where(occ0, ((argb0 >> 8) & 0xFF).astype(jnp.int32), 0)
    sum_b = jnp.where(occ0, (argb0 & 0xFF).astype(jnp.int32), 0)
    out = [(cnt, sum_r, sum_g, sum_b)]
    for lvl in range(1, L):
        gx, gz, h = X >> lvl, Z >> lvl, Y >> lvl

        def down(a):
            return a.reshape(gx, 2, gz, 2, h, 2).sum(axis=(1, 3, 5))

        cnt, sum_r, sum_g, sum_b = (down(cnt), down(sum_r), down(sum_g),
                                    down(sum_b))
        out.append((cnt, sum_r, sum_g, sum_b))
    return out


@functools.partial(jax.jit, static_argnames=("dims", "L"))
def _chain_required_runs(dims, occ_t, argb_t, L):
    """Max per-column run count over every chain level (sizes the static K)."""
    X, Y, Z = dims
    req = jnp.int32(1)
    for lvl, (cnt, _, _, _) in enumerate(_chain_pyramid(dims, occ_t,
                                                        argb_t, L)):
        occ = (cnt > 0)[:, :, ::-1].reshape(-1, Y >> lvl)
        first = jnp.concatenate(
            [jnp.ones((occ.shape[0], 1), bool), occ[:, 1:] != occ[:, :-1]],
            axis=1)
        nr = jnp.sum(first.astype(jnp.int32), axis=1)
        nr = jnp.where(occ.any(axis=1), nr, 0)
        req = jnp.maximum(req, jnp.max(nr))
    return req


@functools.partial(jax.jit, static_argnames=("dims", "L", "K"))
def _chain_build(dims, occ_t, argb_t, L, K):
    """Dense LOD0 -> voxel-exact L-level chain in the renderer's indirect
    layout (col_rec + runs + runs_rev + colors), entirely on device."""
    X, Y, Z = dims
    col_base = np.zeros(8, np.int32)
    for i in range(1, L):
        col_base[i] = col_base[i - 1] + (X >> (i - 1)) * (Z >> (i - 1))
    col_base[L:] = col_base[L - 1]
    grid_z = np.array([max(Z >> min(i, L - 1), 1) for i in range(8)],
                      np.int32)

    runs_parts, runs_rev_parts, colors_parts, rec_parts = [], [], [], []
    run_base, color_base = 0, 1  # colors[0] = skybox
    for lvl, (cnt, sum_r, sum_g, sum_b) in enumerate(
            _chain_pyramid(dims, occ_t, argb_t, L)):
        gx, gz, h = X >> lvl, Z >> lvl, Y >> lvl
        n_cols = gx * gz
        occ = cnt > 0
        d = jnp.maximum(cnt, 1)
        argb = jnp.where(
            occ,
            (jnp.uint32(255 << 24)
             | ((sum_r // d).astype(jnp.uint32) << 16)
             | ((sum_g // d).astype(jnp.uint32) << 8)
             | (sum_b // d).astype(jnp.uint32)),
            jnp.uint32(0))

        occ_l = occ[:, :, ::-1].reshape(n_cols, h)  # top-first
        argb_l = argb[:, :, ::-1].reshape(n_cols, h)
        runs, runs_rev, n_runs = _runs_from_occupancy_batched(occ_l, K)
        occ_i = occ_l.astype(jnp.int32)
        solid_before = jnp.cumsum(occ_i, axis=1) - occ_i
        tgt = jnp.where(occ_l, solid_before, h - 1)
        rows = jnp.broadcast_to(jnp.arange(n_cols)[:, None], (n_cols, h))
        slot = jnp.zeros((n_cols, h), jnp.uint32).at[rows, tgt].max(
            jnp.where(occ_l, argb_l, 0))

        ys = jnp.arange(h, dtype=jnp.int32)[None, None, :]
        BIG = jnp.int32(1 << 20)
        has_solid = occ.any(axis=2)
        vs = 1 << lvl
        cmin = jnp.where(has_solid,
                         jnp.min(jnp.where(occ, ys, BIG), axis=2) * vs,
                         0).reshape(n_cols)
        cmax = jnp.where(has_solid,
                         jnp.max(jnp.where(occ, ys + 1, -BIG), axis=2) * vs,
                         0).reshape(n_cols)

        ar = jnp.arange(n_cols, dtype=jnp.int32)
        rec = jnp.stack([
            n_runs, ar * K + run_base, ar * h + color_base, cmin, cmax,
            jnp.zeros(n_cols, jnp.int32), jnp.zeros(n_cols, jnp.int32),
            jnp.zeros(n_cols, jnp.int32)], axis=1)
        runs_parts.append(runs.reshape(-1))
        runs_rev_parts.append(runs_rev.reshape(-1))
        colors_parts.append(slot.reshape(-1))
        rec_parts.append(rec)
        run_base += n_cols * K
        color_base += n_cols * h

    skybox = jnp.array([0xFF191919], jnp.uint32)
    pad = jnp.zeros(K, jnp.int32)
    return WorldArrays(
        col_base=jnp.asarray(col_base),
        grid_z=jnp.asarray(grid_z),
        col_rec=jnp.concatenate(rec_parts, axis=0),
        runs=jnp.concatenate(runs_parts + [pad]),
        runs_rev=jnp.concatenate(runs_rev_parts + [pad]),
        colors=jnp.concatenate([skybox, *colors_parts]))


def editable_chain_snapshot(spec: EditableWorldSpec, ew: EditableWorld,
                            lod_levels: int):
    """EditableWorld -> (WorldArrays with a voxel-EXACT LOD chain, max_runs).

    Two device passes: a sizing pass finds the chain's true max run count
    (the static K the build is traced for), then the build emits every level.
    Output semantics are identical to the static builder's chain
    (rle.build_lod_chain) on the same voxels — tested dense- and pixel-equal.
    """
    occ_t, argb_t = _editable_dense(spec, ew)
    dims = tuple(spec.dims)
    K = max(int(_chain_required_runs(dims, occ_t, argb_t, lod_levels)), 1)
    return _chain_build(dims, occ_t, argb_t, lod_levels, K), K


def editable_chain_renderer(spec: EditableWorldSpec, ew: EditableWorld,
                            config=None, lod_levels: int | None = None):
    """A Renderer over an EditableWorld's exact-LOD-chain snapshot.

    Unlike `editable_renderer` (live edits, LOD0-only), this renders a chain
    SNAPSHOT with real lod_distances; re-call after edits to refresh the far
    field (`r._wa, _ = editable_chain_snapshot(...)` only recompiles when the
    chain's max run count changes).
    """
    import dataclasses as _dc

    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.render.frame import Renderer

    config = config or RenderConfig(width=640, height=360)
    L = lod_levels or config.lod_levels
    wa, K = editable_chain_snapshot(spec, ew, L)

    @_dc.dataclass
    class _ChainDeviceWorld:
        dims: tuple
        max_runs: int
        _wa: object
        max_col_colors: int = 0
        lite_runs: int = 0

        @property
        def colors(self):
            return self._wa.colors

    r = Renderer.__new__(Renderer)
    r.device_world = _ChainDeviceWorld(spec.dims, K, wa)
    r.config = config
    r.lod_distances = None
    r.far_clip = 0.0
    r._wa = wa
    return r
