"""Vectorized phase-1 ray march (pure JAX, the XLA reference path).

Semantics are the oracle's (render/oracle.py — itself a transliteration of
DrawSegmentRayJob.cs:195-620), re-expressed data-parallel over all ray columns of all
segments at once, per SURVEY.md §7:

- the per-ray ``while(true)`` march becomes a chunked ``lax.while_loop``: each
  iteration rolls the (content-independent!) DDA forward ``CHUNK`` cells per ray,
  bulk-gathers the visited columns' meta + runs from the flat DeviceWorld arrays,
  then rasterizes the chunk with masked lane predication;
- ``return``/``break`` early-outs become per-ray ``alive`` masks; the frame finishes
  when every ray is dead or ``max_chunks`` is exhausted;
- the ``seenPixelCache`` byte array (:208) is the raybuffer row itself: the raybuffer
  holds int32 color *indices* into DeviceWorld.colors (skybox = 0, unwritten = -1);
  actual ARGB values are resolved by one gather at the end of the frame;
- ``WriteSkybox`` on exit (:699-716) is deferred: dead rays simply stop writing, and
  the final resolve fills unwritten pixels inside the segment's pixel range with
  skybox — byte-identical output because written pixels are never overwritten.

The camera-pitch iteration direction (DrawSegmentRayJob.cs:170-192's two kernel
specializations) is a static argument -> two jitted variants.

This path is correctness-first (full-width masked updates per run); the Pallas kernel
in cpuvox_tpu.ops is the performance path and is diffed against this.
"""
from __future__ import annotations

import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.render import segments as sg
from cpuvox_tpu.render.camera import CameraData, mat4_vec
from cpuvox_tpu.render.device import DeviceWorld

F = np.float32
BIG = np.int32(1 << 24)


class RayStatic(NamedTuple):
    """Per-ray constants (host-built)."""

    dirs: jnp.ndarray  # (R, 2) f32 normalized XZ dir
    plane_bottom: jnp.ndarray  # (R, 3) f32 projected column base (pixel, nearval, w)
    plane_top: jnp.ndarray  # (R, 3)
    plane_dir: jnp.ndarray  # (R, 3)
    orig_min: jnp.ndarray  # (R,) i32 segment pixel range
    orig_max: jnp.ndarray  # (R,) i32


class DDAState(NamedTuple):
    pos: jnp.ndarray  # (R, 2) i32
    tmax: jnp.ndarray  # (R, 2) f32
    tdelta: jnp.ndarray  # (R, 2) f32
    stp: jnp.ndarray  # (R, 2) i32
    ids: jnp.ndarray  # (R, 2) f32 intersection distances (last, next)
    lod: jnp.ndarray  # (R,) i32


class RasterState(NamedTuple):
    raybuf: jnp.ndarray  # (R, P) i32 color indices, -1 unwritten
    nfp_min: jnp.ndarray  # (R,) i32
    nfp_max: jnp.ndarray  # (R,) i32
    fb_min: jnp.ndarray  # (R,) f32 frustum bounds
    fb_max: jnp.ndarray  # (R,) f32
    f_active: jnp.ndarray  # (R,) bool — frustum narrowing active
    fdir_min: jnp.ndarray  # (R,) f32
    fdir_max: jnp.ndarray  # (R,) f32
    alive: jnp.ndarray  # (R,) bool


class WorldArrays(NamedTuple):
    col_base: jnp.ndarray
    grid_z: jnp.ndarray
    col_rec: jnp.ndarray | None  # (total_cols, 8): n_runs, run_off, color_off, ...
    runs: jnp.ndarray | None
    runs_rev: jnp.ndarray | None
    colors: jnp.ndarray
    # inline layout (device.py _inline_records): meta + runs in one gather row
    rec_fwd: jnp.ndarray | None = None
    rec_rev: jnp.ndarray | None = None
    # lite records (device.py _pick_lite_tier): meta + the first `lite_runs`
    # runs 16-bit packed in a row narrower than the full record — the gated
    # fetch's fast path on deep-RLE worlds
    lite_fwd: jnp.ndarray | None = None
    lite_rev: jnp.ndarray | None = None
    # occupancy tiles (device.py build_occ_tiles): emptiness bitmap + cmin/cmax
    # per 16x8 column tile per LOD — enables the gated two-stage fetch
    occ_tiles: jnp.ndarray | None = None
    tile_base: jnp.ndarray | None = None
    tile_gz: jnp.ndarray | None = None
    # world-sharded active window [tx0, tz0, t_log2, W] (parallel/world_shard):
    # when set, LOD0 column indices remap through the camera-local tile window
    win: jnp.ndarray | None = None


def _cell_index(wa: "WorldArrays", lodc, v_lod, xc, zc):
    """Column index of visited cells in the (active) world arrays.

    Plain worlds: ci = col_base[lod] + xc * grid_z[lod] + zc (device.py layout).
    World-sharded active worlds (wa.win = [tx0, tz0, t_log2, W] — see
    parallel/world_shard.py) remap LOD0 through the camera-local tile window
    with pure arithmetic: slot = window-relative tile coords, local index =
    row-major within the tile; out-of-window cells resolve to the all-empty
    sentinel tile (slot W*W).  No extra gather rides the hot path — the window
    form exists precisely so the remap is a handful of VPU integer ops.
    """
    ci = (_small_lut(wa.col_base, lodc, 8)
          + xc * _small_lut(wa.grid_z, lodc, 8) + zc)
    if wa.win is None:
        return ci
    tx0, tz0, tl, w = wa.win[0], wa.win[1], wa.win[2], wa.win[3]
    tmask = (jnp.int32(1) << tl) - 1
    txr = (xc >> tl) - tx0
    tzr = (zc >> tl) - tz0
    inw = (txr >= 0) & (txr < w) & (tzr >= 0) & (tzr < w)
    slot = jnp.where(inw, txr * w + tzr, w * w)
    ci0 = (slot << (2 * tl)) + ((xc & tmask) << tl) + (zc & tmask)
    return jnp.where(v_lod == 0, ci0, ci)


def _occ_tile_index(wa: "WorldArrays", lodc, v_lod, xc, zc):
    """Occupancy-tile row of visited cells (16x8 column tiles, device.py
    build_occ_tiles).  World-sharded active worlds remap LOD0 rows through the
    same camera-local window as _cell_index: per-slot blocks of T^2/128 rows,
    off-window -> the all-zero sentinel block (zero bitmap = all-empty, which
    the gate treats exactly like the builder's empty tiles)."""
    ti = (_small_lut(wa.tile_base, lodc, 8)
          + (xc >> 4) * _small_lut(wa.tile_gz, lodc, 8) + (zc >> 3))
    if wa.win is None:
        return ti
    tx0, tz0, tl, w = wa.win[0], wa.win[1], wa.win[2], wa.win[3]
    tmask = (jnp.int32(1) << tl) - 1
    txr = (xc >> tl) - tx0
    tzr = (zc >> tl) - tz0
    inw = (txr >= 0) & (txr < w) & (tzr >= 0) & (tzr < w)
    slot = jnp.where(inw, txr * w + tzr, w * w)
    rows_per_tile = jnp.int32(1) << (2 * tl - 7)  # (T/16)*(T/8)
    ti0 = (slot * rows_per_tile
           + ((xc & tmask) >> 4) * (jnp.int32(1) << (tl - 3))
           + ((zc & tmask) >> 3))
    return jnp.where(v_lod == 0, ti0, ti)


def _small_lut(table, idx, n: int):
    """table[idx] for a tiny (n <= ~10 entries) table as an unrolled select
    chain — XLA lowers tiny-table `table[idx]` as a REAL per-row gather
    (~14ns/row on TPU), which was >1ms per chunk on the hot path."""
    out = jnp.broadcast_to(table[0], idx.shape)
    for k in range(1, n):
        out = jnp.where(idx == k, table[k], out)
    return out


def _fetch_columns(wa: WorldArrays, ci, v_valid, iteration_direction, max_runs,
                   max_col_colors: int = 0):
    """Fetch the visited columns' meta + runs (+ inline ARGB colors).

    TPU gathers cost per gathered *row*.  With the inline record layout
    (device.py: max_runs <= INLINE_MAX_RUNS) the whole column is ONE row —
    [n_runs, color_off, cmin, cmax, runs...] — so a visited cell costs a single
    gather row.  The split fallback (deep-column worlds) gathers an 8-int meta
    record plus one contiguous MAXR run slice (pre-reversed array for the upward
    iteration direction, DrawSegmentRayJob.cs:432-437).
    """
    from cpuvox_tpu.render.device import REC_META, packed_run_words

    if wa.rec_fwd is not None:
        rec_src = wa.rec_fwd if iteration_direction > 0 else wa.rec_rev
        # keep the gather OUT of surrounding fusions (a gather fused into a loop
        # fusion lowers to element-at-a-time code on TPU) and feed it flat
        # indices — measured ~4x faster in the march loop
        flat_ci = jax.lax.optimization_barrier(ci.ravel())
        rec = jax.lax.optimization_barrier(rec_src[flat_ci])
        rec = rec.reshape(ci.shape + (rec.shape[-1],))  # (..., RW)
        n_runs = jnp.where(v_valid, rec[..., 0], 0)
        color_off = rec[..., 1]
        cmin = rec[..., 2]
        cmax = rec[..., 3]
        rwords = packed_run_words(max_runs, max_col_colors)
        if rwords != max_runs:
            # 16-bit-packed run region (device.py): unpack to the kernel's
            # int32 run format after the (now ~half-width) gather.  The color
            # index is an exclusive cumsum of solid lengths (fwd); for the
            # REVERSED iteration table each run keeps its FWD color index =
            # total_solid - cum_before_rev - length.  Bit-exact: integer sums
            # of the same lengths the builder summed.
            words = rec[..., REC_META:REC_META + rwords]
            lo = words & 0xFFFF
            hi = jax.lax.shift_right_logical(words, 16)
            halves = jnp.stack([lo, hi], axis=-1).reshape(
                words.shape[:-1] + (2 * rwords,))[..., :max_runs]
            length = halves & 0x7FFF
            air = (halves & 0x8000) != 0
            solid_len = jnp.where(air, 0, length)
            cum = jnp.cumsum(solid_len, axis=-1)
            cum_excl = cum - solid_len
            if iteration_direction > 0:
                cidx = cum_excl
            else:
                cidx = cum[..., -1:] - cum_excl - length
            runs_k = jnp.where(air, jnp.int32(-1 << 16) | length,
                               (cidx << 16) | length)
            k_iota = jax.lax.broadcasted_iota(
                jnp.int32, runs_k.shape, runs_k.ndim - 1)
            runs_k = jnp.where(k_iota < rec[..., 0:1], runs_k, 0)
        else:
            runs_k = rec[..., REC_META:REC_META + rwords]
        if max_col_colors:  # ARGB mode: the column's colors ride in the record
            colors_k = rec[..., REC_META + rwords:
                           REC_META + rwords + max_col_colors]
            return n_runs, None, color_off, cmin, cmax, runs_k, colors_k
        return n_runs, None, color_off, cmin, cmax, runs_k

    # barrier like the inline path above: without it XLA fuses these gathers
    # into the surrounding march loop and DE-VECTORIZES them (finding 4) —
    # measured 21x on the dynamic surface world once exact-LOD1 pushed its
    # max_runs past the unrolled-sweep threshold (2.4 s/frame -> ~120 ms)
    rec = jax.lax.optimization_barrier(
        wa.col_rec[jax.lax.optimization_barrier(ci.ravel())])
    rec = rec.reshape(ci.shape + (rec.shape[-1],))  # (..., 8)
    n_runs = jnp.where(v_valid, rec[..., 0], 0)
    run_off = rec[..., 1]
    color_off = rec[..., 2]
    cmin = rec[..., 3]
    cmax = rec[..., 4]
    runs_src = wa.runs if iteration_direction > 0 else wa.runs_rev
    flat_off = jax.lax.optimization_barrier(run_off.ravel())
    runs_k = jax.lax.optimization_barrier(jax.vmap(
        lambda o: jax.lax.dynamic_slice(runs_src, (o,), (max_runs,)))(flat_off))
    runs_k = runs_k.reshape(run_off.shape + (max_runs,))
    return n_runs, run_off, color_off, cmin, cmax, runs_k


def world_arrays(dw: DeviceWorld) -> WorldArrays:
    def put(x):
        return None if x is None else jnp.asarray(x)

    return WorldArrays(*(put(getattr(dw, f)) for f in WorldArrays._fields))


# ------------------------------------------------------------------ host-side init


def _np_normalize_rows(v):
    return v / np.sqrt(np.sum(v * v, axis=1, dtype=F))[:, None]


def init_rays(
    cam_data: CameraData,
    segs: list[sg.SegmentData],
    ctxs: list[sg.SegmentContext],
    dims: tuple[int, int, int],
    pad_to: int = 128,
    fixed_size: int | None = None,
):
    """Build per-ray static data + initial DDA state (host numpy, float32).

    Vectorizes DDASetupJob + TraceToFirstColumnJob (DrawSegmentRayJob.cs:49-143).
    Returns (static: RayStatic, dda: DDAState, alive0: (R,), meta dict).
    Ray order: segment 0 rays, then 1, 2, 3 (matching raybuffer row layout with
    the topdown buffer first).
    """
    X, Z = dims[0], dims[2]
    world_max_y = F(dims[1])
    m = cam_data.world_to_screen
    start = cam_data.position_xz.astype(F)

    dirs_l, axis_l, omin_l, omax_l = [], [], [], []
    for si, (seg, ctx) in enumerate(zip(segs, ctxs)):
        if seg.ray_count <= 0:
            continue
        d = sg.ray_directions(seg)
        dirs_l.append(d)
        axis_l.append(np.full(d.shape[0], ctx.axis_mapped_to_y, np.int32))
        omin_l.append(np.full(d.shape[0], ctx.next_free_pixel_min, np.int32))
        omax_l.append(np.full(d.shape[0], ctx.next_free_pixel_max, np.int32))
    n_rays = sum(x.shape[0] for x in dirs_l) if dirs_l else 0
    R = max(pad_to, int(np.ceil(max(n_rays, 1) / pad_to)) * pad_to)
    if fixed_size is not None:
        if n_rays > fixed_size:
            raise ValueError(f"{n_rays} rays exceed fixed_size={fixed_size}")
        R = fixed_size  # one jit signature across cameras (no per-frame recompiles)

    dirs = np.zeros((R, 2), F)
    axis_y = np.zeros(R, np.int32)
    orig_min = np.zeros(R, np.int32)
    orig_max = np.full(R, -1, np.int32)  # padded rays: empty pixel range
    if n_rays:
        dirs[:n_rays] = np.concatenate(dirs_l)
        axis_y[:n_rays] = np.concatenate(axis_l)
        orig_min[:n_rays] = np.concatenate(omin_l)
        orig_max[:n_rays] = np.concatenate(omax_l)
    # avoid 0-direction padding rays producing NaNs anywhere
    dirs[n_rays:] = np.array([1.0, 0.0], F)

    # --- SegmentDDAData ctor (SegmentDDAData.cs:17-28)
    pos = np.floor(start)[None, :].astype(np.int32).repeat(R, 0)
    with np.errstate(divide="ignore"):
        tdelta = F(1.0) / np.maximum(F(1e-7), np.abs(dirs))
    sign_dir = np.sign(dirs).astype(F)
    stp = sign_dir.astype(np.int32)
    frac = start - np.floor(start)
    tmax = (sign_dir * -frac[None, :] + sign_dir * F(0.5) + F(0.5)) * tdelta
    ids = np.stack([(tmax - tdelta).max(1), tmax.min(1)], axis=1)

    alive = np.zeros(R, bool)
    alive[:n_rays] = True
    lod = np.zeros(R, np.int32)

    # --- TraceToFirstColumnJob (DrawSegmentRayJob.cs:95-143)
    outside = (pos[:, 0] < 0) | (pos[:, 0] >= X) | (pos[:, 1] < 0) | (pos[:, 1] >= Z)
    if np.any(outside & alive):
        sel = np.nonzero(outside & alive)[0]
        ok = _step_to_world_intersection(
            start, dirs[sel], tdelta[sel], np.array([X, Z], F))
        hit, n_pos, n_tmax, n_ids = ok
        alive[sel] = hit
        pos[sel] = n_pos
        tmax[sel] = n_tmax
        ids[sel] = n_ids
        # LOD fast-forward (:123-128)
        lod_dist = np.append(cam_data.lod_distances.astype(F), [F(np.inf)] * 2)
        for _ in range(len(lod_dist) - 2):
            adv = alive & outside & (ids[:, 0] >= lod_dist[lod])
            if not np.any(adv):
                break
            a = np.nonzero(adv)[0]
            vsize = (1 << lod[a]).astype(np.int32)
            pos[a], tmax[a], tdelta[a], stp[a], ids[a] = _np_next_lod(
                pos[a], tmax[a], tdelta[a], stp[a], dirs[a], vsize)
            lod[a] += 1
        # IsBeyondFarClip (:130)
        beyond = alive & outside & (tmax.min(1) >= F(cam_data.far_clip))
        alive &= ~beyond

    # --- SetupProjectedPlaneParams (:622-651); start is the camera for all rays
    # explicit sequential order (camera.mat4_vec): BLAS `@` accumulation order
    # is a platform detail and measured 1 ulp off this form on the build host
    pb4 = mat4_vec(m, (start[0], F(0.0), start[1], F(1.0)))
    pt4 = mat4_vec(m, (start[0], world_max_y, start[1], F(1.0)))
    # pd4[:, i] = dirs.x*m[i,0] + 0*m[i,1] + dirs.z*m[i,2] + 0*m[i,3],
    # sequential left-to-right — the batched twin of mat4_vec (the explicit
    # zero terms keep the op sequence identical to device_init's pd4)
    zero = np.zeros(R, F)
    pd4 = np.stack([
        ((dirs[:, 0] * m[i, 0] + zero * m[i, 1]) + dirs[:, 1] * m[i, 2])
        + zero * m[i, 3]
        for i in range(4)], axis=1)
    sel_xzw = np.array([0, 2, 3])
    sel_yzw = np.array([1, 2, 3])
    take = np.where(axis_y[:, None] == 0, sel_xzw[None, :], sel_yzw[None, :])
    plane_bottom = pb4[take]
    plane_top = pt4[take]
    plane_dir = np.take_along_axis(pd4, take, axis=1)

    static = RayStatic(
        dirs=jnp.asarray(dirs), plane_bottom=jnp.asarray(plane_bottom),
        plane_top=jnp.asarray(plane_top), plane_dir=jnp.asarray(plane_dir),
        orig_min=jnp.asarray(orig_min), orig_max=jnp.asarray(orig_max))
    dda = DDAState(pos=jnp.asarray(pos), tmax=jnp.asarray(tmax),
                   tdelta=jnp.asarray(tdelta), stp=jnp.asarray(stp),
                   ids=jnp.asarray(ids), lod=jnp.asarray(lod))
    return static, dda, jnp.asarray(alive), {"n_rays": n_rays, "R": R}


def _np_next_lod(pos, tmax, tdelta, stp, dirs, vsize):
    """Vectorized SegmentDDAData.NextLOD (numpy, used at init)."""
    rem = pos & (2 * vsize - 1)[:, None]
    tmax_prev = tmax - tdelta
    low = rem < vsize[:, None]
    inc = (dirs >= 0) == low
    tmax = np.where(inc, tmax + tdelta, tmax)
    tmax_prev = np.where(~inc, tmax_prev - tdelta, tmax_prev)
    ids = np.stack([tmax_prev.max(1), tmax.min(1)], axis=1)
    return pos - rem, tmax, tdelta * F(2.0), stp * 2, ids


def _step_to_world_intersection(start, dirs, tdelta, dims_f):
    """Vectorized SegmentDDAData.StepToWorldIntersection (:75-130)."""
    n = dirs.shape[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        tmin = np.full((n, 2), -np.inf, F)
        tmax_ = np.full((n, 2), np.inf, F)
        for ax in range(2):
            nz = dirs[:, ax] != 0.0
            t1 = -start[ax] / dirs[:, ax]
            t2 = (dims_f[ax] - start[ax]) / dirs[:, ax]
            tmin[nz, ax] = np.minimum(t1, t2)[nz]
            tmax_[nz, ax] = np.maximum(t1, t2)[nz]
        tmint = tmin.max(1)
        tmaxt = tmax_.min(1)
        hit = ~((tmaxt < tmint) | (tmint <= 0.0))

        t_last = np.zeros((n, 2), F)
        use_x = (tmin[:, 0] < tmin[:, 1]) & (tmin[:, 0] != -np.inf)
        # axis with the later entry keeps its plain tmin; the other axis snaps to the
        # last grid boundary before the entry point
        for ax, other in ((0, 1), (1, 0)):
            m = use_x if ax == 0 else ~use_x
            off = tmint * dirs[:, ax]
            hitpos = start[ax] + off
            hitpos = np.where(dirs[:, ax] > 0, np.floor(hitpos), np.ceil(hitpos))
            t_last[m, ax] = ((hitpos - start[ax]) / dirs[:, ax])[m]
            t_last[m, other] = tmin[m, other]
        new_tmax = t_last + tdelta
        ids = np.stack([t_last.max(1), new_tmax.min(1)], axis=1)
        mid = ids[:, 0] + (ids[:, 1] - ids[:, 0]) * F(0.5)
        pos = np.floor(start[None, :] + mid[:, None] * dirs).astype(np.int32)
    return hit, pos, new_tmax, ids


# ------------------------------------------------------------------ device march


def _dda_step(dda: DDAState, far_clip):
    """SegmentDDAData.Step (:135-150), batched."""
    x_first = dda.tmax[:, 0] < dda.tmax[:, 1]
    crossed = jnp.where(x_first, dda.tmax[:, 0], dda.tmax[:, 1])
    bump = jnp.stack([x_first, ~x_first], axis=1)
    tmax = dda.tmax + jnp.where(bump, dda.tdelta, 0.0)
    pos = dda.pos + jnp.where(bump, dda.stp, 0)
    ids = jnp.stack([crossed, tmax.min(1)], axis=1)
    hit_far = crossed >= far_clip
    return dda._replace(pos=pos, tmax=tmax, ids=ids), hit_far


def _dda_next_lod(dda: DDAState, dirs):
    """SegmentDDAData.NextLOD (:31-73), batched."""
    vsize = (1 << dda.lod).astype(jnp.int32)
    rem = dda.pos & (2 * vsize - 1)[:, None]
    tmax_prev = dda.tmax - dda.tdelta
    low = rem < vsize[:, None]
    inc = (dirs >= 0) == low
    tmax = jnp.where(inc, dda.tmax + dda.tdelta, dda.tmax)
    tmax_prev = jnp.where(~inc, tmax_prev - dda.tdelta, tmax_prev)
    ids = jnp.stack([tmax_prev.max(1), tmax.min(1)], axis=1)
    return dda._replace(pos=dda.pos - rem, tmax=tmax, tdelta=dda.tdelta * 2.0,
                        stp=dda.stp * 2, ids=ids, lod=dda.lod + 1)


def _roll_chunk(dda: DDAState, alive, dirs, lod_distances, far_clip, dims, chunk):
    """Advance every ray CHUNK cells, recording the visit list.

    Content-independent: mirrors the loop structure of ExecuteRay:235-245,613-615
    (lod switch -> visit cell -> step) plus the out-of-world termination
    (World.GetVoxelColumn == -1, :247-250).
    """
    X, Z = dims[0], dims[2]

    def body(carry, _):
        dda, alive = carry
        # PRE-switch snapshot rides the visit list so the gated march can
        # REWIND a ray to an unprocessed cell: re-rolling from the body-entry
        # state replays the LOD switch (if any) with identical inputs, so the
        # whole float trajectory is bit-identical.  (tdelta/stp are
        # reconstructed from lod: they only ever scale by exact powers of two.)
        pre = (dda.pos, dda.tmax, dda.ids, dda.lod)
        ldist = _small_lut(lod_distances,
                           jnp.clip(dda.lod, 0, lod_distances.shape[0] - 1),
                           lod_distances.shape[0])
        switch = alive & (dda.ids[:, 0] >= ldist)
        nxt = _dda_next_lod(dda, dirs)
        dda = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                switch.reshape((-1,) + (1,) * (a.ndim - 1)), b, a), dda, nxt)
        in_bounds = ((dda.pos[:, 0] >= 0) & (dda.pos[:, 0] < X)
                     & (dda.pos[:, 1] >= 0) & (dda.pos[:, 1] < Z))
        valid = alive & in_bounds
        alive = valid
        visit = (dda.pos, dda.ids, dda.lod, valid) + pre
        stepped, hit_far = _dda_step(dda, far_clip)
        dda = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                alive.reshape((-1,) + (1,) * (a.ndim - 1)), b, a), dda, stepped)
        alive = alive & ~hit_far
        return (dda, alive), visit

    # unroll=4: the body is ~30 tiny elementwise ops on (R, 2) arrays — per
    # scan iteration that costs several kernel launches, so unrolling fuses 4
    # steps per launch.  (A FULL Python unroll fused best on paper but made the
    # executable so large that queued dispatch through this environment's TPU
    # tunnel collapsed to ~8 s/frame; scan+unroll keeps the program small.)
    (dda, alive), visits = jax.lax.scan(body, (dda, alive), None, length=chunk,
                                        unroll=4)
    return dda, alive, visits


def _roll_chunk_pallas(dda: DDAState, alive, dirs, lod_distances, far_clip,
                       dims, chunk, interpret=False):
    """`_roll_chunk` as ONE Pallas program (ops/roll_kernel) — bit-identical
    visit list and carry-out (the roll's ops have no rounding ambiguity; see
    the kernel docstring), minus the per-scan-iteration launch overhead."""
    from ..ops import roll_kernel as rk

    R = dda.pos.shape[0]
    NLD = lod_distances.shape[0]
    if R % 128 != 0 or NLD > 7:
        # ADVICE r4: loud fallback so a kernel_roll='on' A/B can never
        # silently benchmark the scan path while labeled as the Pallas leg
        if not getattr(_roll_chunk_pallas, "_warned", False):
            _roll_chunk_pallas._warned = True
            print(f"WARNING: kernel_roll='on' fell back to the scan roll "
                  f"(R={R} % 128 != 0 or NLD={NLD} > 7)", file=sys.stderr,
                  flush=True)
        return _roll_chunk(dda, alive, dirs, lod_distances, far_clip, dims,
                           chunk)
    G = R // 128

    def g(x):
        return x.reshape(G, 128)

    state = {
        "pos_x": g(dda.pos[:, 0]), "pos_z": g(dda.pos[:, 1]),
        "tmax_x": g(dda.tmax[:, 0]), "tmax_z": g(dda.tmax[:, 1]),
        "tdelta_x": g(dda.tdelta[:, 0]), "tdelta_z": g(dda.tdelta[:, 1]),
        "stp_x": g(dda.stp[:, 0]), "stp_z": g(dda.stp[:, 1]),
        "ids0": g(dda.ids[:, 0]), "ids1": g(dda.ids[:, 1]),
        "lod": g(dda.lod), "alive": g(alive.astype(jnp.int32)),
    }
    aux = jnp.concatenate([
        jnp.broadcast_to(lod_distances[:, None].astype(jnp.float32),
                         (NLD, 128)),
        jnp.zeros((7 - NLD, 128), jnp.float32),
        jnp.full((1, 128), far_clip, jnp.float32)], axis=0)
    vis, st = rk.roll_chunk_pallas(
        state, aux, g(dirs[:, 0]), g(dirs[:, 1]),
        C=chunk, X=int(dims[0]), Z=int(dims[2]), NLD=NLD,
        interpret=interpret)

    def fr(i):  # visit field -> (C, R)
        return vis[:, i].reshape(chunk, R)

    def ff(i):  # f32 visit field
        return jax.lax.bitcast_convert_type(fr(i), jnp.float32)

    def st2(a, b):
        return jnp.stack([a, b], axis=-1)

    visits = (st2(fr(0), fr(1)), st2(ff(2), ff(3)), fr(4), fr(5) != 0,
              st2(fr(6), fr(7)), st2(ff(8), ff(9)), st2(ff(10), ff(11)),
              fr(12))
    dda_out = DDAState(
        pos=st2(st["pos_x"], st["pos_z"]).reshape(R, 2),
        tmax=st2(st["tmax_x"], st["tmax_z"]).reshape(R, 2),
        tdelta=st2(st["tdelta_x"], st["tdelta_z"]).reshape(R, 2),
        stp=st2(st["stp_x"], st["stp_z"]).reshape(R, 2),
        ids=st2(st["ids0"], st["ids1"]).reshape(R, 2),
        lod=st["lod"].reshape(R))
    return dda_out, st["alive"].reshape(R) != 0, visits


def _next_unwritten_geq(seen, c):
    """first y >= c with seen[y] False; (R, P) x (R,) -> (R,)."""
    P = seen.shape[1]
    pix = jnp.arange(P, dtype=jnp.int32)[None, :]
    cand = jnp.where((~seen) & (pix >= c[:, None]), pix, BIG)
    return cand.min(axis=1)


def _prev_unwritten_leq(seen, c):
    pix = jnp.arange(seen.shape[1], dtype=jnp.int32)[None, :]
    cand = jnp.where((~seen) & (pix <= c[:, None]), pix, -BIG)
    return cand.max(axis=1)


def _clip_world_bounds(p_min, p_max, fmin, fmax):
    """Batched CameraData.GetWorldBoundsClippingCamSpace (CameraData.cs:51-121).

    p_min/p_max: (R, 3); fmin/fmax: (R,).  Returns (clipped, min_lerp, max_lerp).
    """
    one = jnp.float32(1.0)

    def clip_pair(frustum):
        finv = one / frustum
        c0 = p_max[:, 0] * finv - p_max[:, 2]  # cross((1, finv), (x, z))
        c1 = p_min[:, 0] * finv - p_min[:, 2]
        return one - (c0 / (c0 - c1)), c1 / (c1 - c0)

    min_at_fmax, max_at_fmax = clip_pair(fmax)
    min_at_fmin, max_at_fmin = clip_pair(fmin)

    amin = p_min[:, 0] > p_min[:, 2] * fmax  # min endpoint above the max frustum
    amax = p_max[:, 0] > p_max[:, 2] * fmax
    bmin = p_min[:, 0] < p_min[:, 2] * fmin  # below the min frustum
    bmax = p_max[:, 0] < p_max[:, 2] * fmin

    clipped = (amin & amax) | (~amin & ~amax & bmin & bmax)

    min_lerp = jnp.where(
        amin, min_at_fmax,
        jnp.where(amax, jnp.where(bmin, min_at_fmin, 0.0),
                  jnp.where(bmin & ~bmax, min_at_fmin, 0.0)))
    max_lerp = jnp.where(
        amin, jnp.where(bmax, max_at_fmin, 1.0),
        jnp.where(amax, max_at_fmax,
                  jnp.where(~bmin & bmax, max_at_fmin, 1.0)))
    return clipped, min_lerp, max_lerp


def _near_clip_line(a, b, u_a=None, u_b=None):
    """Batched CameraData.ClipHomogeneousCameraSpaceLine (:124-157)."""
    a_behind = a[:, 1] <= 0.0
    b_behind = b[:, 1] <= 0.0
    visible = ~(a_behind & b_behind)
    with np.errstate(divide="ignore", invalid="ignore"):
        v_a = (b[:, 1] / (b[:, 1] - a[:, 1]))[:, None]
        v_b = (a[:, 1] / (a[:, 1] - b[:, 1]))[:, None]
    clip_a = a_behind & ~b_behind
    clip_b = b_behind & ~a_behind
    a2 = jnp.where(clip_a[:, None], b + (a - b) * v_a, a)
    b2 = jnp.where(clip_b[:, None], a + (b - a) * v_b, b)
    if u_a is None:
        return visible, a2, b2
    u_a2 = jnp.where(clip_a, u_b + (u_a - u_b) * v_a[:, 0], u_a)
    u_b2 = jnp.where(clip_b, u_a + (u_b - u_a) * v_b[:, 0], u_b)
    return visible, a2, b2, u_a2, u_b2


def _reduce_pixel_horizon(rs: RasterState, rb_min, rb_max, mask):
    """Batched ReducePixelHorizon (DrawSegmentRayJob.cs:660-697).

    Returns (rs', rb_min', rb_max') with nfp/frustum bounds narrowed where mask.
    """
    seen = rs.raybuf >= 0
    c1 = mask & (rb_min <= rs.nfp_min)
    rb_min2 = jnp.where(c1, rs.nfp_min, rb_min)
    inner1 = c1 & (rb_max >= rs.nfp_min)
    new_min = _next_unwritten_geq(seen, rb_max + 1)
    nfp_min = jnp.where(inner1, new_min, rs.nfp_min)
    fb_min = jnp.where(inner1, new_min.astype(jnp.float32) - 0.501, rs.fb_min)

    c2 = mask & (rb_max >= rs.nfp_max)
    rb_max2 = jnp.where(c2, rs.nfp_max, rb_max)
    inner2 = c2 & (rb_min2 <= rs.nfp_max)
    new_max = _prev_unwritten_leq(seen, rb_min2 - 1)
    nfp_max = jnp.where(inner2, new_max, rs.nfp_max)
    fb_max = jnp.where(inner2, new_max.astype(jnp.float32) + 0.501, rs.fb_max)
    return rs._replace(nfp_min=nfp_min, nfp_max=nfp_max, fb_min=fb_min,
                       fb_max=fb_max), rb_min2, rb_max2


def _write_span(rs: RasterState, rb_min, rb_max, values, mask):
    """Masked pixel-span write: only unwritten pixels in [rb_min, rb_max], only rows
    in `mask`.  Resets frustum narrowing on rows that wrote anything (:522,598).
    Returns (rs', killed) where killed = rows whose free range closed (:535-539)."""
    P = rs.raybuf.shape[1]
    pix = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_span = (pix >= rb_min[:, None]) & (pix <= rb_max[:, None]) & mask[:, None]
    do_write = in_span & (rs.raybuf < 0)
    raybuf = jnp.where(do_write, values, rs.raybuf)
    wrote = do_write.any(axis=1)
    f_active = rs.f_active & ~wrote
    killed = mask & (rs.nfp_min > rs.nfp_max)
    return rs._replace(raybuf=raybuf, f_active=f_active), killed


def _rasterize_step(rs: RasterState, inputs, wa: WorldArrays, static: RayStatic,
                    consts, iteration_direction: int, max_runs: int):
    """Process one visited cell for every ray (the body of ExecuteRay:245-611)."""
    pos, ids, lod, valid, n_runs, run_off, color_off, cmin, cmax, runs_k = inputs
    world_max_y = consts["world_max_y"]
    cam_y = consts["cam_y"]
    cam_y_norm = consts["cam_y_norm"]

    alive = rs.alive & valid
    vscale_f = (1 << lod).astype(jnp.float32)

    # ---- frustum-vs-column cull (:258-281); empty columns skip it entirely
    # (the columnRuns == 0 step/continue at :251-256 comes first)
    nonempty = n_runs > 0
    dist_top = jnp.where(rs.fdir_max > 0.0, ids[:, 1], ids[:, 0])
    dist_bot = jnp.where(rs.fdir_min < 0.0, ids[:, 1], ids[:, 0])
    new_max = cam_y + rs.fdir_max * dist_top
    new_min = cam_y + rs.fdir_min * dist_bot
    f_act = rs.f_active
    cull_world = alive & nonempty & f_act & ((new_min > world_max_y)
                                             | (new_max < 0.0))
    alive = alive & ~cull_world
    if consts.get("solid_max_y") is not None:
        # ---- solid-bound kill (output-exact; no reference analog — strictly
        # stronger than the :261-281 world-box retire).  While f_active holds,
        # fdir is FROZEN (it only changes at do_clip, which requires ~f_act, or
        # resets on a write).  With fdir_min >= 0 the window bottom new_min is
        # monotone in distance, and every column's cmax <= solid_max_y, so
        # new_min > solid_max_y means every future cell is a provable skip_col:
        # the ray can never write again and killing it changes no output pixel
        # (symmetric for the window top vs solid_min_y).  Kills the post-write
        # sky tail that otherwise marches to far clip.
        kill_solid = alive & f_act & (
            ((rs.fdir_min >= 0.0) & (new_min > consts["solid_max_y"]))
            | ((rs.fdir_max <= 0.0) & (new_max < consts["solid_min_y"])))
        alive = alive & ~kill_solid
    skip_col = f_act & ((cmin.astype(jnp.float32) > new_max)
                        | (cmax.astype(jnp.float32) < new_min))
    wb_min = jnp.where(f_act, new_min, 0.0)
    wb_max = jnp.where(f_act, new_max, world_max_y)
    process = alive & ~skip_col & (n_runs > 0)

    # ---- project the world column at both intersections (:289-293)
    cs_min_last = static.plane_bottom + static.plane_dir * ids[:, 0:1]
    cs_min_next = static.plane_bottom + static.plane_dir * ids[:, 1:2]
    cs_max_last = static.plane_top + static.plane_dir * ids[:, 0:1]
    cs_max_next = static.plane_top + static.plane_dir * ids[:, 1:2]

    # ---- writable-frustum re-clip when dirty (:295-422)
    do_clip = process & (ids[:, 0] > 2.0) & ~f_act
    cl_clipped, cl_min, cl_max = _clip_world_bounds(
        cs_min_last, cs_max_last, rs.fb_min, rs.fb_max)
    cn_clipped, cn_min, cn_max = _clip_world_bounds(
        cs_min_next, cs_max_next, rs.fb_min, rs.fb_max)

    kill_clip = do_clip & cl_clipped & cn_clipped
    alive = alive & ~kill_clip
    process = process & ~kill_clip
    do_clip = do_clip & ~kill_clip

    # three cases: last clipped / next clipped / neither (:321-390)
    case_l = cl_clipped  # (and not cn_clipped, else killed above)
    case_n = ~cl_clipped & cn_clipped

    sel_min_lerp = jnp.where(case_l, cn_min, jnp.where(case_n, cl_min,
                             jnp.minimum(cl_min, cn_min)))
    sel_max_lerp = jnp.where(case_l, cn_max, jnp.where(case_n, cl_max,
                             jnp.maximum(cl_max, cn_max)))
    wbc_min = world_max_y * sel_min_lerp  # lerp(0, maxY, t)
    wbc_max = world_max_y * sel_max_lerp
    # distances used for the frustum direction slopes
    dist_for_min = jnp.where(case_l, ids[:, 1],
                             jnp.where(case_n, ids[:, 0],
                                       jnp.where(cl_min < cn_min, ids[:, 0],
                                                 ids[:, 1])))
    dist_for_max = jnp.where(case_l, ids[:, 1],
                             jnp.where(case_n, ids[:, 0],
                                       jnp.where(cl_max > cn_max, ids[:, 0],
                                                 ids[:, 1])))
    fdir_min_new = (wbc_min - cam_y) / dist_for_min
    fdir_max_new = (wbc_max - cam_y) / dist_for_max

    def screen_x(base_min, base_max, t):
        p = base_min + (base_max - base_min) * t[:, None]
        return p[:, 0] / p[:, 2]

    # screen-space clipped extent (the camSpaceClippedMin/Max dance)
    l_min_x = screen_x(cs_min_last, cs_max_last, cl_min)
    l_max_x = screen_x(cs_min_last, cs_max_last, cl_max)
    n_min_x = screen_x(cs_min_next, cs_max_next, cn_min)
    n_max_x = screen_x(cs_min_next, cs_max_next, cn_max)
    l_lo = jnp.minimum(l_min_x, l_max_x)
    l_hi = jnp.maximum(l_min_x, l_max_x)
    n_lo = jnp.minimum(n_min_x, n_max_x)
    n_hi = jnp.maximum(n_min_x, n_max_x)
    cs_clip_min = jnp.where(case_l, n_lo, jnp.where(case_n, l_lo,
                            jnp.minimum(l_lo, n_lo)))
    cs_clip_max = jnp.where(case_l, n_hi, jnp.where(case_n, l_hi,
                            jnp.maximum(l_hi, n_hi)))

    wb_min = jnp.where(do_clip, jnp.floor(wbc_min), wb_min)
    wb_max = jnp.where(do_clip, jnp.ceil(wbc_max), wb_max)
    fdir_min_st = jnp.where(do_clip, fdir_min_new, rs.fdir_min)
    fdir_max_st = jnp.where(do_clip, fdir_max_new, rs.fdir_max)
    f_active_new = rs.f_active | do_clip

    writable_min = jnp.floor(cs_clip_min).astype(jnp.int32)
    writable_max = jnp.ceil(cs_clip_max).astype(jnp.int32)
    kill_miss = do_clip & ((writable_max < rs.nfp_min) | (writable_min > rs.nfp_max))
    alive = alive & ~kill_miss
    process = process & ~kill_miss
    do_clip = do_clip & ~kill_miss

    seen = rs.raybuf >= 0
    adv_min = do_clip & (writable_min > rs.nfp_min)
    nfp_min2 = jnp.where(adv_min, _next_unwritten_geq(seen, writable_min), rs.nfp_min)
    adv_max = do_clip & (writable_max < rs.nfp_max)
    nfp_max2 = jnp.where(adv_max, _prev_unwritten_leq(seen, writable_max), rs.nfp_max)
    kill_closed = do_clip & (nfp_min2 > nfp_max2)
    alive = alive & ~kill_closed
    process = process & ~kill_closed

    rs = rs._replace(nfp_min=nfp_min2, nfp_max=nfp_max2,
                     fdir_min=fdir_min_st, fdir_max=fdir_max_st,
                     f_active=f_active_new, alive=alive)

    # ---- RLE run iteration (:424-611)
    if iteration_direction > 0:
        eb0 = jnp.full_like(wb_min, world_max_y)
        eb_min0, eb_max0 = eb0, eb0
    else:
        eb_min0 = jnp.zeros_like(wb_min)
        eb_max0 = jnp.zeros_like(wb_min)

    def run_body(k, carry):
        rs, eb_min, eb_max, run_done, process = carry
        # runs arrive pre-ordered for the iteration direction (runs_rev for dir<0)
        run = runs_k[:, k]
        length = run & 0xFFFF
        cidx = run >> 16
        is_air = run < 0
        k_valid = process & rs.alive & (k < n_runs) & ~run_done

        len_scaled = (length * (1 << lod)).astype(jnp.float32)
        if iteration_direction > 0:
            eb_max_n = eb_min
            eb_min_n = eb_min - len_scaled
        else:
            eb_min_n = eb_max
            eb_max_n = eb_min_n + len_scaled
        eb_min = jnp.where(k_valid, eb_min_n, eb_min)
        eb_max = jnp.where(k_valid, eb_max_n, eb_max)

        above = eb_min > wb_max
        below = eb_max < wb_min
        if iteration_direction > 0:
            brk = k_valid & ~is_air & below
        else:
            brk = k_valid & ~is_air & above
        run_done = run_done | brk
        draw = k_valid & ~is_air & ~above & ~below

        # lerp the projected full-world lines per run (:477-481)
        portion_bottom = eb_min / world_max_y  # unlerp(0, maxY, eb)
        portion_top = eb_max / world_max_y
        cs_front_bottom = cs_min_last + (cs_max_last - cs_min_last) \
            * portion_bottom[:, None]
        cs_front_top = cs_min_last + (cs_max_last - cs_min_last) \
            * portion_top[:, None]

        # --- side span (:484-542)
        u_a0 = length.astype(jnp.float32)
        u_b0 = jnp.zeros_like(u_a0)
        vis, fa, fb_, u_a, u_b = _near_clip_line(
            cs_front_bottom, cs_front_top, u_a0, u_b0)
        side = draw & vis
        uv_a = jnp.stack([jnp.ones_like(u_a), u_a], axis=1) / fa[:, 2:3]
        uv_b = jnp.stack([jnp.ones_like(u_b), u_b], axis=1) / fb_[:, 2:3]
        rbf_a = fa[:, 0] / fa[:, 2]
        rbf_b = fb_[:, 0] / fb_[:, 2]
        flip = rbf_a > rbf_b
        rbf_lo = jnp.where(flip, rbf_b, rbf_a)
        rbf_hi = jnp.where(flip, rbf_a, rbf_b)
        uv_lo = jnp.where(flip[:, None], uv_b, uv_a)
        uv_hi = jnp.where(flip[:, None], uv_a, uv_b)
        rb_min = jnp.round(rbf_lo).astype(jnp.int32)
        rb_max = jnp.round(rbf_hi).astype(jnp.int32)
        overlap = side & (rb_max >= rs.nfp_min) & (rb_min <= rs.nfp_max)
        rs, rb_min2, rb_max2 = _reduce_pixel_horizon(rs, rb_min, rb_max, overlap)
        # per-pixel perspective-correct color index (:519-533)
        P = rs.raybuf.shape[1]
        pixf = jnp.arange(P, dtype=jnp.float32)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            l = (pixf - rbf_lo[:, None]) / (rbf_hi - rbf_lo)[:, None]
            wu0 = uv_lo[:, 0:1] + (uv_hi[:, 0:1] - uv_lo[:, 0:1]) * l
            wu1 = uv_lo[:, 1:2] + (uv_hi[:, 1:2] - uv_lo[:, 1:2]) * l
            u = wu1 / wu0
        iu = jnp.where(jnp.isnan(u), 0, jnp.floor(u).astype(jnp.int32))
        color_local = jnp.clip(iu, 0, (length - 1)[:, None]) + cidx[:, None]
        values = color_off[:, None] + color_local
        rs, killed = _write_span(rs, rb_min2, rb_max2, values, overlap)
        rs = rs._replace(alive=rs.alive & ~killed)

        # --- top/bottom cap (:544-610)
        live = draw & rs.alive
        top_cap = portion_top < cam_y_norm
        bot_cap = ~top_cap & (portion_bottom > cam_y_norm)
        skip_top = top_cap & (eb_max > wb_max)
        skip_bot = bot_cap & (eb_min < wb_min)
        cap = live & ((top_cap & ~skip_top) | (bot_cap & ~skip_bot))
        sec_color_idx = jnp.where(top_cap, cidx, cidx + length - 1)
        portion_cap = jnp.where(top_cap, portion_top, portion_bottom)
        cs_sec_a = cs_min_next + (cs_max_next - cs_min_next) * portion_cap[:, None]
        cs_sec_b = jnp.where(top_cap[:, None], cs_front_top, cs_front_bottom)
        vis2, sa, sb = _near_clip_line(cs_sec_a, cs_sec_b)
        cap = cap & vis2
        rbf2 = jnp.stack([jnp.round(sa[:, 0] / sa[:, 2]),
                          jnp.round(sb[:, 0] / sb[:, 2])], axis=1)
        rb2_min = jnp.minimum(rbf2[:, 0], rbf2[:, 1]).astype(jnp.int32)
        rb2_max = jnp.maximum(rbf2[:, 0], rbf2[:, 1]).astype(jnp.int32)
        overlap2 = cap & (rb2_max >= rs.nfp_min) & (rb2_min <= rs.nfp_max)
        rs, rb2_min2, rb2_max2 = _reduce_pixel_horizon(rs, rb2_min, rb2_max, overlap2)
        cap_values = (color_off + sec_color_idx)[:, None] + jnp.zeros_like(rs.raybuf)
        rs, killed2 = _write_span(rs, rb2_min2, rb2_max2, cap_values, overlap2)
        rs = rs._replace(alive=rs.alive & ~killed2)

        return rs, eb_min, eb_max, run_done, process

    run_done0 = jnp.zeros_like(process)
    rs, *_ = jax.lax.fori_loop(
        0, max_runs, run_body, (rs, eb_min0, eb_max0, run_done0, process))
    return rs


def march(
    wa: WorldArrays,
    static: RayStatic,
    dda: DDAState,
    alive0,
    rs: RasterState,
    lod_distances,
    far_clip,
    dims,
    world_max_y,
    cam_y,
    iteration_direction: int,
    chunk: int,
    max_chunks: int,
    max_runs: int,
    solid_min_y=None,
    solid_max_y=None,
):
    """Full phase-1 march: chunked roll + gather + rasterize until all rays die."""
    # cam_y may be scalar (single camera) or per-ray (batched multi-camera mode,
    # where rays of several cameras are concatenated into one march)
    cam_y = jnp.asarray(cam_y, jnp.float32)
    consts = {
        "world_max_y": jnp.float32(world_max_y),
        "cam_y": cam_y,
        "cam_y_norm": cam_y / jnp.float32(world_max_y),
        "solid_min_y": (None if solid_min_y is None
                        else jnp.float32(solid_min_y)),
        "solid_max_y": (None if solid_max_y is None
                        else jnp.float32(solid_max_y)),
    }
    lod_distances = jnp.asarray(lod_distances)

    def cond(carry):
        i, dda, alive, rs = carry
        return (i < max_chunks) & (alive & rs.alive).any()

    def body(carry):
        i, dda, alive, rs = carry
        march_alive = alive & rs.alive
        dda, march_alive, visits = _roll_chunk(
            dda, march_alive, static.dirs, lod_distances, far_clip, dims, chunk)
        v_pos, v_ids, v_lod, v_valid = visits[:4]  # (C, R, ...)

        lodc = jnp.clip(v_lod, 0, 7)
        ci = _cell_index(wa, lodc, v_lod,
                         v_pos[:, :, 0] >> v_lod, v_pos[:, :, 1] >> v_lod)
        ci = jnp.where(v_valid, ci, 0)
        n_runs, run_off, color_off, cmin, cmax, runs_k = _fetch_columns(
            wa, ci, v_valid, iteration_direction, max_runs)

        def raster_scan(rs, step_in):
            return _rasterize_step(rs, step_in, wa, static, consts,
                                   iteration_direction, max_runs), None

        rs, _ = jax.lax.scan(
            raster_scan, rs,
            (v_pos, v_ids, v_lod, v_valid, n_runs, run_off, color_off, cmin, cmax,
             runs_k))
        return i + 1, dda, march_alive, rs

    init = (jnp.int32(0), dda, alive0, rs)
    _, dda, alive, rs = jax.lax.while_loop(cond, body, init)
    return rs


def phase1(wa, static, dda, alive0, lod_distances, far_clip, world_max_y, cam_y,
           iteration_direction, chunk, max_chunks, max_runs, dims, pixel_len,
           solid_min_y=None, solid_max_y=None):
    """Unjitted full phase 1 (march + deferred skybox fill); jit via march_jit."""
    R = static.dirs.shape[0]
    rs = RasterState(
        raybuf=jnp.full((R, pixel_len), -1, jnp.int32),
        nfp_min=static.orig_min,
        nfp_max=static.orig_max,
        fb_min=static.orig_min.astype(jnp.float32) - 0.501,
        fb_max=static.orig_max.astype(jnp.float32) + 0.501,
        f_active=jnp.zeros(R, bool),
        fdir_min=jnp.zeros(R, jnp.float32),
        fdir_max=jnp.zeros(R, jnp.float32),
        alive=jnp.ones(R, bool),
    )
    rs = march(wa, static, dda, alive0, rs, lod_distances, far_clip, dims,
               world_max_y, cam_y, iteration_direction, chunk, max_chunks,
               max_runs, solid_min_y=solid_min_y, solid_max_y=solid_max_y)
    # deferred WriteSkybox (:699-716): unwritten pixels inside the segment range -> 0
    P = pixel_len
    pix = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_range = (pix >= static.orig_min[:, None]) & (pix <= static.orig_max[:, None])
    raybuf = jnp.where((rs.raybuf < 0) & in_range, 0, rs.raybuf)
    return raybuf


march_jit = jax.jit(
    phase1,
    static_argnames=("iteration_direction", "chunk", "max_chunks", "max_runs",
                     "dims", "pixel_len"))


# --------------------------------------------------------- Pallas-backed phase 1


def phase1_pallas(wa, static, dda, alive0, lod_distances, far_clip, world_max_y,
                  cam_y, iteration_direction, chunk, max_chunks, max_runs, dims,
                  pixel_len, block_groups=4, interpret=False,
                  max_col_colors: int = 0, skybox_argb: int = 0xFF191919,
                  occupancy: bool = False, gated_cells: int = 0,
                  lite_runs: int = 0, block_fetch: bool = True,
                  rb_cap: int = 4, drain_groups: int = 0,
                  solid_min_y: float | None = None,
                  solid_max_y: float | None = None,
                  sweep_skip: bool = True, slot_gate: bool = False,
                  walk_tile: int = 8, walk_cond: bool = True,
                  roll_pallas: bool = False,
                  ablate_kernel: str = "", ablate_pipeline: str = ""):
    """Phase 1 with the chunk rasterizer as a Pallas TPU kernel (cpuvox_tpu.ops.
    phase1_kernel).  Same DDA roll + gathers as `phase1`; per-ray state and the
    raybuffer live in kernel-friendly (G, 128)-lane layout.

    The march is STAGED with live-ray compaction: the per-chunk cost (column
    gather rows, kernel grid blocks, DDA roll) is proportional to the array
    width, and the live-ray count decays fast (frames start with ~30% of the
    worst-case padded capacity alive and decay along the march) — so each stage
    runs a while_loop at a fixed width, exits when the live count fits the next
    (halved, 1024-quantum) width, scatters finished rows into the output
    accumulator, stable-sorts live rays to a prefix, and continues narrow.
    Everything is in-graph (no host syncs; shapes per stage are static).
    Equivalent of the reference's live-ray compaction between pipeline stages
    (DrawSegmentRayJob.cs:91,133,142 NativeList ParallelWriter)."""
    from cpuvox_tpu.ops import phase1_kernel as pk

    R = static.dirs.shape[0]
    assert R % 1024 == 0, f"pallas path needs R % 1024 == 0, got {R}"
    BG = 8  # Mosaic: block second-minor dim of (BG, 128) state blocks must be 8-div
    del block_groups
    P = ((pixel_len + 7) // 8) * 8
    C = chunk
    MAXR = max_runs
    MCC = max_col_colors
    occupancy = occupancy and wa.occ_tiles is not None
    # cells rasterized per gated group (the packed kernel's chunk size): the
    # fetch pays GK x Rk gather slots per chunk whether or not lanes have that
    # many gated cells, while rays with MORE than GK gated cells rewind and
    # re-pay the chunk roll — so GK trades slot waste against rewinds
    # (output-exact either way); tunable via RenderConfig.gated_group_cells
    GK = gated_cells if gated_cells else (16 if C % 16 == 0 else 8)
    if occupancy:
        assert GK <= C, f"gated group {GK} must not exceed chunk {C}"
    # tile-slot budget per chunk: a ray crosses at most ~C/16 x-tile + ~C/8
    # z-tile boundaries plus one slot per LOD switch; overflow slots degrade to
    # "fetch the record" (correct, just unpruned), so a common-case budget is safe
    TS = C // 8 + 4
    lod_distances = jnp.asarray(lod_distances)
    cam_y_full = jnp.broadcast_to(jnp.asarray(cam_y, jnp.float32), (R,))

    # dev perf-bisection hooks (explicit STATIC args, never env reads — a stray
    # environment variable cannot silently corrupt output): output is WRONG
    # whenever either is set
    ablate2 = ablate_pipeline
    if ablate2:
        import sys
        print(f"WARNING: phase1 pipeline ablation {ablate2!r} active — "
              "output is intentionally WRONG (dev bisection only)",
              file=sys.stderr, flush=True)

    # everything per-ray that must travel through compactions, flat (Rk,) leading
    per_ray = {
        "dirs": static.dirs,
        "pb": static.plane_bottom,
        "pt": static.plane_top,
        "pd": static.plane_dir,
        "omin": static.orig_min,
        "omax": static.orig_max,
        "cam_y": cam_y_full,
        "nfp_min": static.orig_min,
        "nfp_max": static.orig_max,
        "fb_min": static.orig_min.astype(jnp.float32) - 0.501,
        "fb_max": static.orig_max.astype(jnp.float32) + 0.501,
        "fdir_min": jnp.zeros(R, jnp.float32),
        "fdir_max": jnp.zeros(R, jnp.float32),
        "f_active": jnp.zeros(R, jnp.int32),
        "alive_rs": jnp.ones(R, jnp.int32),
        "orig_row": jnp.arange(R, dtype=jnp.int32),
    }
    dda_c = dda
    march_alive = alive0
    raybuf_rp = jnp.full((R, P), -1, jnp.int32)  # per-ray rows, current order
    out_rows = jnp.full((R, P), -1, jnp.int32)  # accumulator, ORIGINAL order
    i_total = jnp.int32(0)

    sizes = [R]
    while True:
        nxt = ((sizes[-1] // 2 + 1023) // 1024) * 1024
        if nxt < 1024 or nxt >= sizes[-1]:
            break
        sizes.append(nxt)

    def run_stage(Rk, next_rk, i_total, dda_c, march_alive, raybuf_rp, per_ray):
        G = Rk // 128

        def g128(x):
            return x.reshape(G, 128)

        consts = {
            "pb_p": g128(per_ray["pb"][:, 0]),
            "pb_n": g128(per_ray["pb"][:, 1]),
            "pb_w": g128(per_ray["pb"][:, 2]),
            "pt_p": g128(per_ray["pt"][:, 0]),
            "pt_n": g128(per_ray["pt"][:, 1]),
            "pt_w": g128(per_ray["pt"][:, 2]),
            "pd_p": g128(per_ray["pd"][:, 0]),
            "pd_n": g128(per_ray["pd"][:, 1]),
            "pd_w": g128(per_ray["pd"][:, 2]),
            "cam_y": g128(per_ray["cam_y"]),
            "cam_y_norm": g128(per_ray["cam_y"] / jnp.float32(world_max_y)),
            "orig_min": g128(per_ray["omin"]),
            "orig_max": g128(per_ray["omax"]),
        }
        state = {
            "nfp_min": g128(per_ray["nfp_min"]),
            "nfp_max": g128(per_ray["nfp_max"]),
            "fb_min": g128(per_ray["fb_min"]),
            "fb_max": g128(per_ray["fb_max"]),
            "fdir_min": g128(per_ray["fdir_min"]),
            "fdir_max": g128(per_ray["fdir_max"]),
            "f_active": g128(per_ray["f_active"]),
            "alive": g128(per_ray["alive_rs"]),
        }
        raybuf = raybuf_rp.reshape(G, 128, P).transpose(0, 2, 1)
        dirs = per_ray["dirs"]

        def cond(carry):
            i, dda, alive, raybuf, state = carry
            n = (alive & (state["alive"].reshape(Rk) != 0)).sum()
            return (i < max_chunks) & (n > next_rk)

        def rasterize_cells(NC, fields, raybuf, state):
            """Build the stacked per-cell block for NC cells and run the kernel.

            fields = (ids0_bits, ids1_bits, lod, valid_i32, n_runs, color_off,
            cmin, cmax, runs_k[, colors_k]) — all (NC, Rk[, ...])."""
            (ids0b, ids1b, lod_f, valid_i, n_runs, color_off, cmin, cmax,
             runs_k, colors_k) = fields

            def to_cg(x):  # (NC, Rk) -> (NC, G, 128) — cell-major layout, free
                return x.reshape(NC, G, 128)

            # ONE stacked per-cell input (fields then runs then inline colors):
            # each pallas grid step then waits on a single per-cell block DMA
            # instead of nine small ones (DMA latency dominated the kernel)
            parts = [
                to_cg(ids0b), to_cg(ids1b), to_cg(lod_f), to_cg(valid_i),
                to_cg(n_runs), to_cg(color_off), to_cg(cmin), to_cg(cmax),
                runs_k.reshape(NC, G, 128, MAXR).transpose(0, 3, 1, 2),
            ]
            if MCC:
                parts.append(
                    colors_k.reshape(NC, G, 128, MCC).transpose(0, 3, 1, 2))
            stacked = jnp.concatenate(
                [p[:, None] if p.ndim == 3 else p for p in parts], axis=1)
            return pk.rasterize_chunk(
                stacked, consts, raybuf, state,
                C=NC, MAXR=MAXR, BG=BG, P=P,
                iteration_direction=iteration_direction,
                world_max_y=float(world_max_y), interpret=interpret, MCC=MCC,
                ablate=ablate_kernel, rb_cap=rb_cap,
                solid_min_y=solid_min_y, solid_max_y=solid_max_y,
                sweep_skip=sweep_skip, slot_gate=slot_gate,
                walk_tile=walk_tile, walk_cond=walk_cond)

        def fetch(ci, valid):
            """Column-record fetch with the dead-slot SPREAD trick: dead slots
            point at spread rows, not all at row 0 — duplicate-heavy index
            streams measurably slow the TPU gather unit (PERF_NOTES #2); the
            fetched garbage is masked by `valid` downstream."""
            n_rows = (wa.rec_fwd if wa.rec_fwd is not None
                      else wa.col_rec).shape[0]
            spread = (jax.lax.broadcasted_iota(jnp.int32, ci.shape, 1)
                      % jnp.int32(n_rows))
            ci = jnp.where(valid, ci, spread)
            if MCC:
                (n_runs, _, color_off, cmin, cmax, runs_k,
                 colors_k) = _fetch_columns(
                    wa, ci, valid, iteration_direction, MAXR, MCC)
            else:
                n_runs, _, color_off, cmin, cmax, runs_k = _fetch_columns(
                    wa, ci, valid, iteration_direction, MAXR)
                colors_k = None
            return n_runs, color_off, cmin, cmax, runs_k, colors_k

        def body(carry):
            i, dda, alive, raybuf, state = carry
            march_alive = alive & (state["alive"].reshape(Rk) != 0)
            roll = _roll_chunk_pallas if roll_pallas else _roll_chunk
            kw = {"interpret": interpret} if roll_pallas else {}
            dda, march_alive, visits = roll(
                dda, march_alive, dirs, lod_distances, far_clip, dims, chunk,
                **kw)
            (v_pos, v_ids, v_lod, v_valid,
             p_pos, p_tmax, p_ids, p_lod) = visits  # (C, Rk, ...)

            lodc = jnp.clip(v_lod, 0, 7)
            xc = v_pos[:, :, 0] >> v_lod
            zc = v_pos[:, :, 1] >> v_lod
            ci = _cell_index(wa, lodc, v_lod, xc, zc)

            if not occupancy:
                # ---- dense path: one record row per visited cell
                if ablate2 == "nogather":
                    zeros = jnp.zeros((chunk, Rk), jnp.int32)
                    n_runs, color_off, cmin, cmax = zeros, zeros, zeros, zeros
                    runs_k = jnp.zeros((chunk, Rk, MAXR), jnp.int32)
                    colors_k = (jnp.zeros((chunk, Rk, MCC), jnp.int32)
                                if MCC else None)
                else:
                    n_runs, color_off, cmin, cmax, runs_k, colors_k = fetch(
                        ci, v_valid)
                if ablate2 == "nopallas":
                    raybuf = raybuf.at[:, 0, :].add(
                        jnp.sum(runs_k, axis=(0, 2)).reshape(G, 128)
                        + jnp.sum(n_runs + color_off + cmin + cmax, axis=0)
                        .reshape(G, 128))
                    return i + 1, dda, march_alive, raybuf, state

                def bits(x):  # f32 fields ride the int32 stack bit-exactly
                    return jax.lax.bitcast_convert_type(x, jnp.int32)

                raybuf, state = rasterize_cells(
                    C, (bits(v_ids[:, :, 0]), bits(v_ids[:, :, 1]), v_lod,
                        v_valid.astype(jnp.int32), n_runs, color_off, cmin,
                        cmax, runs_k, colors_k), raybuf, state)
                return i + 1, dda, march_alive, raybuf, state

            # ---- gated two-stage path (the reference's empty-column `continue`,
            # DrawSegmentRayJob.cs:251-256, re-designed for the TPU's cost model:
            # gathers cost per ROW, so the only lever is fewer gathered rows).
            #
            # Stage A: one occupancy-tile row per DISTINCT 16x8 tile the ray
            # crosses this chunk (~C/8 rows instead of C).  Consecutive steps
            # share a tile, so dedupe by packing first-steps-of-tiles to a TS
            # budget via one small sort; budget overflow degrades to "fetch".
            ti = _occ_tile_index(wa, lodc, v_lod, xc, zc)
            step_iota = jax.lax.broadcasted_iota(jnp.int32, (C, Rk), 0)
            new = jnp.concatenate(
                [jnp.ones((1, Rk), bool), ti[1:] != ti[:-1]], axis=0)
            slot = jnp.cumsum(new.astype(jnp.int32), axis=0) - 1
            key_a = jnp.where(new, step_iota, BIG)
            _, ti_s = jax.lax.sort((key_a, ti), dimension=0, num_keys=1,
                                   is_stable=False)
            packed_ti = ti_s[:TS]
            n_tiles = wa.occ_tiles.shape[0]
            flat_ti = jax.lax.optimization_barrier(
                jnp.clip(packed_ti, 0, n_tiles - 1).ravel())
            occ_rows = jax.lax.optimization_barrier(wa.occ_tiles[flat_ti])
            occ_rows = occ_rows.reshape(TS, Rk, occ_rows.shape[-1])

            # per-step bit + tile cmin/cmax extract: select the step's tile row
            # (TS-way) and bitmap word (4-way) with where-chains — no gathers
            slot_c = jnp.minimum(slot, TS - 1)
            w_idx = (xc & 15) >> 2
            wv = jnp.zeros((C, Rk), jnp.int32)
            tcmin = jnp.zeros((C, Rk), jnp.int32)
            tcmax = jnp.zeros((C, Rk), jnp.int32)
            for t in range(TS):
                m = slot_c == t
                for k in range(4):
                    wv = jnp.where(m & (w_idx == k),
                                   occ_rows[t, :, k][None, :], wv)
                tcmin = jnp.where(m, occ_rows[t, :, 4][None, :], tcmin)
                tcmax = jnp.where(m, occ_rows[t, :, 5][None, :], tcmax)
            bit_pos = ((xc & 3) << 3) | (zc & 7)
            bit = jnp.bitwise_and(jnp.right_shift(wv, bit_pos), 1)
            overflow = slot >= TS
            bitish = (bit != 0) | overflow

            # ---- conservative frustum-window gate (the skip-column test of
            # DrawSegmentRayJob.cs:258-281 lifted to tile granularity).  While a
            # ray's frustum narrowing is active and UNTAINTED (no step this
            # chunk could write or re-clip — fdir/f_active can only change at a
            # processed cell), the kernel's per-step window is exactly
            # [cam_y + fdir_min*db, cam_y + fdir_max*dt] with fdir frozen at
            # chunk-start values — so a tile whose [cmin, cmax] misses that
            # window is a provable skip_col for every column in it.  Margins
            # absorb FMA-contraction ULP drift.  Steps where a CULL might fire
            # (window outside the world kills the ray even on skipped columns,
            # :261-281) count as triggers instead of skips.
            WMYf = jnp.float32(world_max_y)
            camy_r = consts["cam_y"].reshape(Rk)
            fdmin_r = state["fdir_min"].reshape(Rk)[None, :]
            fdmax_r = state["fdir_max"].reshape(Rk)[None, :]
            fact0 = state["f_active"].reshape(Rk) != 0
            dt = jnp.where(fdmax_r > 0, v_ids[:, :, 1], v_ids[:, :, 0])
            db = jnp.where(fdmin_r < 0, v_ids[:, :, 1], v_ids[:, :, 0])
            new_max = camy_r[None, :] + fdmax_r * dt
            new_min = camy_r[None, :] + fdmin_r * db
            margin = 1e-5 * (jnp.abs(new_max) + jnp.abs(new_min) + 1.0)
            cull_might = (new_min + margin > WMYf) | (new_max - margin < 0.0)
            excl = (fact0[None, :] & ~cull_might & ~overflow
                    & ((tcmin.astype(jnp.float32) > new_max + margin)
                       | (tcmax.astype(jnp.float32) < new_min - margin)))
            # taint: from the first step the kernel might process, later windows
            # are no longer bounded by the frozen-fdir form — stop skipping there
            trigger = (v_valid & bitish & ~excl).astype(jnp.int32)
            taint_before = jnp.concatenate(
                [jnp.zeros((1, Rk), jnp.int32),
                 jnp.cumsum(trigger[:-1], axis=0)], axis=0) > 0
            gate = v_valid & bitish & (taint_before | ~excl)

            if solid_max_y is not None:
                # solid-bound pre-kill (see _rasterize_step): on an UNTAINTED
                # step the frozen-fdir window is exact, so a monotone window
                # past the world's solid Y bounds retires the ray BEFORE the
                # fetch — this is the only kill that reaches rays whose every
                # visit is occupancy-gated away (empty-region sky tails the
                # in-kernel kill never sees).  Margins absorb contraction
                # drift, same as `excl` above.  Cells at and after a killing
                # step are provable skip_cols — drop them from the gate too.
                kill_pre = (fact0[None, :] & v_valid & ~taint_before
                            & (((fdmin_r >= 0.0)
                                & (new_min - margin > jnp.float32(solid_max_y)))
                               | ((fdmax_r <= 0.0)
                                  & (new_max + margin
                                     < jnp.float32(solid_min_y)))))
                kill_from = jnp.cumsum(kill_pre.astype(jnp.int32), axis=0) > 0
                gate = gate & ~kill_from
                dead = kill_from[-1]
                state = dict(state, alive=jnp.where(
                    dead.reshape(G, 128), 0, state["alive"]))

            # Stage B: pack gated steps to a per-ray prefix (order-preserving —
            # keys are the step indices) and fetch + rasterize them in groups
            # of GK cells; empty/invalid steps are provable kernel no-ops
            # (phase1_kernel `work` gating), so dropping them is output-exact.
            key_b = jnp.where(gate, step_iota, BIG)
            kb_s, ci_s, i0_s, i1_s, lod_s = jax.lax.sort(
                (key_b, ci,
                 jax.lax.bitcast_convert_type(v_ids[:, :, 0], jnp.int32),
                 jax.lax.bitcast_convert_type(v_ids[:, :, 1], jnp.int32),
                 v_lod), dimension=0, num_keys=1, is_stable=False)

            # Group drain policy: with the block-conditional fetch, a group's
            # cost tracks its NONEMPTY lane blocks, so draining the whole
            # chunk in up to C/GK groups is cheap (a busy ray's extra groups
            # fetch only its own block) and avoids the rewind's full chunk
            # re-roll + re-sort + re-occupancy-fetch.  Without block_fetch
            # every extra group pays GK x Rk slots (max-per-ray bound), so
            # the old ONE-group-per-chunk + rewind policy is kept there.
            # Rays whose processed prefix stops anyway (lite's second deep
            # cell) set a per-lane `stopped` flag so later groups cannot
            # process cells out of per-ray order; the rewind below resumes
            # them exactly at the first unprocessed cell.

            # lite fast path (deep-RLE worlds): fetch ADAPTIVE-tier lite rows
            # (meta + the first `lite_runs` runs, 16-bit packed — e.g. tier 24
            # is 2 gather-row units vs mill's 4 full units and covers 88% of
            # its nonempty columns); "deep" cells (n_runs > tier) take a
            # second per-lane-NARROW full fetch for each lane's FIRST deep
            # cell, and the per-lane processed prefix stops before a second
            # deep cell (the rewind below resumes there)
            use_lite = (wa.lite_fwd is not None and MCC == 0
                        and lite_runs > 0)
            LR = lite_runs
            LW = (LR + 1) // 2  # lite run words (always 16-bit packed)
            LD = 2  # deep-cell full-record fetch slots per lane per group
            # drain_groups: how many GK-cell groups drain a chunk before the
            # busy-ray rewind takes over.  0 = auto (historic policy: all
            # C/GK groups when the block-conditional fetch can skip empty
            # blocks, else ONE group + rewind).  Explicit values let the
            # multi-group drain be A/B'd WITHOUT the per-block conds, whose
            # launch overhead measured -456 ms on mill1024 (PERF_NOTES 25).
            if drain_groups:
                MAXG = min(drain_groups, C // GK)
            else:
                MAXG = (C // GK) if block_fetch else 1

            def gcond(gc):
                g, raybuf, state, cap, stopped = gc
                head = jax.lax.dynamic_slice_in_dim(kb_s, g * GK, 1, axis=0)
                return (g < MAXG) & jnp.any(head < BIG)

            def group_fields(ci_g, vk):
                """Fetch + field prep for one gated group slice: (GK, RW) cell
                indices + gate mask -> (proc, n_runs, color_off, cmin, cmax,
                runs_k[, colors_k]).  RW is Rk (full-width) or 128 (one lane
                block inside the block-conditional scan); every op here is
                within-lane or along the GK axis, so the per-block slice
                computes exactly the full-width slice's columns."""
                RW = ci_g.shape[1]
                if use_lite:
                    lite_src = (wa.lite_fwd if iteration_direction > 0
                                else wa.lite_rev)
                    nl_rows = lite_src.shape[0]
                    spread = (jax.lax.broadcasted_iota(
                        jnp.int32, ci_g.shape, 1) % jnp.int32(nl_rows))
                    flat = jax.lax.optimization_barrier(
                        jnp.where(vk, ci_g, spread).ravel())
                    lrec = jax.lax.optimization_barrier(lite_src[flat])
                    lrec = lrec.reshape(ci_g.shape + (lrec.shape[-1],))
                    slot0 = lrec[..., 0]
                    n_l = jnp.where(vk, slot0 & 0xFF, 0)
                    tot = jax.lax.shift_right_logical(slot0, 8)
                    deep = n_l > LR
                    dexcl = jnp.cumsum(deep.astype(jnp.int32), axis=0) - deep
                    # processed prefix: everything before the lane's (LD+1)-th
                    # deep cell this group — the first LD deep cells each get a
                    # narrow full-record row (deep rank r rides fetch row r).
                    # LD=1 stopped lanes often enough at mill/1080p scale to
                    # exhaust the round-3 chunk budget and truncate rays
                    # (PERF_NOTES 26 root cause); LD=2 makes stops rare, and
                    # the guaranteed march budget (frame.march_params) makes
                    # ANY stop rate output-exact.
                    proc = vk & ((dexcl < LD) | ((dexcl == LD) & ~deep))
                    dmask = [deep & (dexcl == r) for r in range(LD)]
                    ci_d = jnp.stack(
                        [jnp.sum(jnp.where(m, ci_g, 0), axis=0) for m in dmask])
                    has_d = jnp.stack([jnp.any(m, axis=0) for m in dmask])

                    def deep_fetch():
                        fr = fetch(ci_d, has_d)
                        return fr[0], fr[4]

                    def deep_zeros():
                        return (jnp.zeros((LD, RW), jnp.int32),
                                jnp.zeros((LD, RW, MAXR), jnp.int32))

                    # most groups have no deep cell at all (88% tier coverage
                    # on mill) — skip the full-width fallback gather entirely
                    fr_n, fr_runs = jax.lax.cond(
                        jnp.any(has_d), deep_fetch, deep_zeros)
                    n_runs = jnp.where(proc, n_l, 0)
                    for r in range(LD):
                        n_runs = jnp.where(dmask[r], fr_n[r][None, :], n_runs)
                    color_off = lrec[..., 1]
                    cmin = lrec[..., 2]
                    cmax = lrec[..., 3]
                    # unpack the 16-bit run words; the color index is an
                    # integer cumsum of solid lengths exactly like
                    # _fetch_columns, except the reversed direction uses the
                    # column TOTAL from slot 0 (the prefix may be truncated)
                    words = lrec[..., 4:4 + LW]
                    lo = words & 0xFFFF
                    hi = jax.lax.shift_right_logical(words, 16)
                    halves = jnp.stack([lo, hi], axis=-1).reshape(
                        words.shape[:-1] + (2 * LW,))[..., :LR]
                    length = halves & 0x7FFF
                    air = (halves & 0x8000) != 0
                    solid_len = jnp.where(air, 0, length)
                    cum = jnp.cumsum(solid_len, axis=-1)
                    cum_excl = cum - solid_len
                    if iteration_direction > 0:
                        cidx = cum_excl
                    else:
                        cidx = tot[..., None] - cum_excl - length
                    runs_l = jnp.where(air, jnp.int32(-1 << 16) | length,
                                       (cidx << 16) | length)
                    k_iota = jax.lax.broadcasted_iota(
                        jnp.int32, runs_l.shape, runs_l.ndim - 1)
                    runs_l = jnp.where(k_iota < n_l[..., None], runs_l, 0)
                    runs_k = jnp.concatenate(
                        [runs_l, jnp.zeros((GK, RW, MAXR - LR), jnp.int32)],
                        axis=-1)
                    for r in range(LD):
                        runs_k = jnp.where(dmask[r][:, :, None],
                                           fr_runs[r][None, :, :], runs_k)
                    colors_k = None
                else:
                    proc = vk
                    n_runs, color_off, cmin, cmax, runs_k, colors_k = fetch(
                        ci_g, vk)
                out = (proc.astype(jnp.int32), n_runs, color_off, cmin, cmax,
                       runs_k)
                return out + ((colors_k,) if MCC else ())

            def gbody(gc):
                g, raybuf, state, cap, stopped = gc

                def sl(a):
                    return jax.lax.dynamic_slice_in_dim(a, g * GK, GK, axis=0)

                # stopped lanes (lite prefix cap) must not process LATER cells
                # before their first unprocessed one — masked until the rewind
                vk = (sl(kb_s) < BIG) & (stopped == 0)[None, :]  # (GK, Rk)
                if ablate2 == "nofetch":  # dev bisection: WRONG output
                    z = jnp.zeros((GK, Rk), jnp.int32)
                    proc = vk
                    n_runs, color_off, cmin, cmax = z, z, z, z
                    runs_k = jnp.zeros((GK, Rk, MAXR), jnp.int32)
                    colors_k = (jnp.zeros((GK, Rk, MCC), jnp.int32)
                                if MCC else None)
                elif block_fetch and G > 1:
                    # block-conditional fetch: scan over 128-lane ray blocks,
                    # skipping the gather for blocks with zero gated cells
                    # this group (most blocks, on mostly-air content — the
                    # full-width fetch paid GK x Rk slots at ~22% utilization,
                    # PERF_NOTES #15).  Skipped blocks yield zeros == exactly
                    # what the kernel's valid/n_runs gating ignores.
                    cib = sl(ci_s).reshape(GK, G, 128).transpose(1, 0, 2)
                    vkb = vk.reshape(GK, G, 128).transpose(1, 0, 2)

                    def blk(_, cv):
                        ci_i, vk_i = cv

                        def zeros():
                            z = jnp.zeros((GK, 128), jnp.int32)
                            zr = jnp.zeros((GK, 128, MAXR), jnp.int32)
                            out = (z, z, z, z, z, zr)
                            if MCC:
                                out += (jnp.zeros((GK, 128, MCC), jnp.int32),)
                            return out

                        return None, jax.lax.cond(
                            jnp.any(vk_i != 0),
                            lambda: group_fields(ci_i, vk_i != 0), zeros)

                    _, outs = jax.lax.scan(
                        blk, None, (cib, vkb.astype(jnp.int32)))

                    def back(x):  # (G, GK, 128[, W]) -> (GK, Rk[, W])
                        if x.ndim == 3:
                            return x.transpose(1, 0, 2).reshape(GK, Rk)
                        return x.transpose(1, 0, 2, 3).reshape(
                            GK, Rk, x.shape[-1])

                    outs = tuple(back(x) for x in outs)
                    proc_i, n_runs, color_off, cmin, cmax, runs_k = outs[:6]
                    proc = proc_i != 0
                    colors_k = outs[6] if MCC else None
                else:
                    outs = group_fields(sl(ci_s), vk)
                    proc_i, n_runs, color_off, cmin, cmax, runs_k = outs[:6]
                    proc = proc_i != 0
                    colors_k = outs[6] if MCC else None
                if ablate2 == "noraster":  # dev bisection: WRONG output
                    raybuf = raybuf.at[:, 0, :].add(
                        jnp.sum(runs_k, axis=(0, 2)).reshape(G, 128)
                        + jnp.sum(n_runs + color_off + cmin + cmax, axis=0)
                        .reshape(G, 128))
                else:
                    raybuf, state = rasterize_cells(
                        GK, (sl(i0_s), sl(i1_s), sl(lod_s),
                             proc.astype(jnp.int32), n_runs, color_off, cmin,
                             cmax, runs_k, colors_k), raybuf, state)
                cap = cap + jnp.sum(proc.astype(jnp.int32), axis=0)
                stopped = stopped | jnp.any(
                    vk & ~proc, axis=0).astype(jnp.int32)
                return g + 1, raybuf, state, cap, stopped

            _, raybuf, state, cap, _ = jax.lax.while_loop(
                gcond, gbody,
                (jnp.int32(0), raybuf, state, jnp.zeros(Rk, jnp.int32),
                 jnp.zeros(Rk, jnp.int32)))

            # rewind busy rays to their first unprocessed gated cell: the next
            # chunk re-rolls from exactly that cell (same DDA state -> same
            # float trajectory), so every gated cell is rasterized exactly
            # once, in per-ray order, regardless of the cap.
            count = jnp.sum(gate.astype(jnp.int32), axis=0)
            pos2 = jnp.cumsum(gate.astype(jnp.int32), axis=0) - 1
            rwm = gate & (pos2 == cap[None, :])  # first unprocessed gated cell
            needs = (count > cap) & (state["alive"].reshape(Rk) != 0)

            def rsum(f):  # exact: exactly one nonzero summand per busy ray
                return jnp.sum(jnp.where(rwm, f, 0), axis=0)

            lod_rw = rsum(p_lod)
            dda_rw = DDAState(
                pos=jnp.stack([rsum(p_pos[:, :, 0]), rsum(p_pos[:, :, 1])], 1),
                tmax=jnp.stack([rsum(p_tmax[:, :, 0]),
                                rsum(p_tmax[:, :, 1])], 1),
                # tdelta/stp only ever scale by exact powers of two per LOD
                tdelta=jnp.ldexp(dda.tdelta,
                                 (lod_rw - dda.lod)[:, None]).astype(
                                     jnp.float32),
                stp=jnp.sign(dda.stp) * (1 << lod_rw)[:, None],
                ids=jnp.stack([rsum(p_ids[:, :, 0]), rsum(p_ids[:, :, 1])], 1),
                lod=lod_rw)
            nb = needs[:, None]
            dda = DDAState(
                pos=jnp.where(nb, dda_rw.pos, dda.pos),
                tmax=jnp.where(nb, dda_rw.tmax, dda.tmax),
                tdelta=jnp.where(nb, dda_rw.tdelta, dda.tdelta),
                stp=jnp.where(nb, dda_rw.stp, dda.stp),
                ids=jnp.where(nb, dda_rw.ids, dda.ids),
                lod=jnp.where(needs, dda_rw.lod, dda.lod))
            march_alive = march_alive | needs
            return i + 1, dda, march_alive, raybuf, state

        init = (i_total, dda_c, march_alive, raybuf, state)
        i_total, dda_c, march_alive, raybuf, state = jax.lax.while_loop(
            cond, body, init)

        raybuf_rp = raybuf.transpose(0, 2, 1).reshape(Rk, P)
        for k in ("nfp_min", "nfp_max", "fb_min", "fb_max", "fdir_min",
                  "fdir_max", "f_active"):
            per_ray[k] = state[k].reshape(Rk)
        per_ray["alive_rs"] = state["alive"].reshape(Rk)
        return i_total, dda_c, march_alive, raybuf_rp, per_ray

    for si, Rk in enumerate(sizes):
        next_rk = sizes[si + 1] if si + 1 < len(sizes) else 0
        i_total, dda_c, march_alive, raybuf_rp, per_ray = run_stage(
            Rk, next_rk, i_total, dda_c, march_alive, raybuf_rp, per_ray)
        # bank current rows in original order (later stages overwrite kept rays)
        out_rows = out_rows.at[per_ray["orig_row"]].set(raybuf_rp)
        if next_rk:
            alive_now = march_alive & (per_ray["alive_rs"] != 0)
            order = jnp.argsort(jnp.logical_not(alive_now))[:next_rk]
            per_ray = {k: v[order] for k, v in per_ray.items()}
            dda_c = jax.tree_util.tree_map(lambda x: x[order], dda_c)
            march_alive = march_alive[order]
            raybuf_rp = raybuf_rp[order]

    # deferred skybox fill in ORIGINAL ray order
    rb = out_rows[:, :pixel_len]
    pix = jnp.arange(pixel_len, dtype=jnp.int32)[None, :]
    in_range = (pix >= static.orig_min[:, None]) & (pix <= static.orig_max[:, None])
    if MCC:
        # ARGB mode: written texels carry colors with the alpha MSB cleared —
        # restore it; unwritten in-range -> skybox ARGB, out-of-range -> magenta
        rb_u = jnp.bitwise_or(rb.astype(jnp.uint32), jnp.uint32(0x80000000))
        return jnp.where(rb < 0,
                         jnp.where(in_range, jnp.uint32(skybox_argb),
                                   jnp.uint32(0xFFFF1493)),
                         rb_u)
    return jnp.where((rb < 0) & in_range, 0, rb)


march_pallas_jit = jax.jit(
    phase1_pallas,
    static_argnames=("world_max_y", "iteration_direction", "chunk", "max_chunks",
                     "max_runs", "dims", "pixel_len", "block_groups", "interpret",
                     "max_col_colors", "skybox_argb", "occupancy",
                     "gated_cells", "lite_runs", "block_fetch", "rb_cap",
                     "drain_groups", "sweep_skip", "slot_gate", "walk_tile",
                     "walk_cond", "roll_pallas", "ablate_kernel",
                     "ablate_pipeline"))


def resolve_colors(raybuf_idx, colors, debug_magenta=np.uint32(0xFFFF1493)):
    """Color-index raybuffer -> ARGB uint32; unwritten (-1) -> debug magenta."""
    vals = colors[jnp.clip(raybuf_idx, 0, colors.shape[0] - 1)]
    return jnp.where(raybuf_idx < 0, jnp.uint32(debug_magenta), vals)


def resolve_colors_banded(screen_idx, colors,
                          debug_magenta=np.uint32(0xFFFF1493)):
    """resolve_colors for the (H, W) screen, skipping the gather for 8-row
    bands whose indices are all <= 0 (sky/out-of-range) — sky is spatially
    coherent (the upper screen), and the resolve gather costs ~27 ns per ROW
    regardless of the index values (PERF_NOTES cost table), so the only lever
    is issuing fewer rows.  Bit-identical to resolve_colors: an all-<=0 band
    resolves to colors[0] / magenta with no gather."""
    H, W = screen_idx.shape
    B = 8
    pad = (-H) % B
    idx = screen_idx if not pad else jnp.pad(
        screen_idx, ((0, pad), (0, 0)), constant_values=-1)
    bands = idx.reshape((H + pad) // B, B, W)
    sky = jnp.broadcast_to(colors[0], (B, W))

    def band(_, bi):
        def do():
            return resolve_colors(bi, colors, debug_magenta)

        def skip():
            return jnp.where(bi < 0, jnp.uint32(debug_magenta), sky)

        return None, jax.lax.cond(jnp.any(bi > 0), do, skip)

    _, out = jax.lax.scan(band, None, bands)
    return out.reshape(H + pad, W)[:H]
