"""Device (TPU) LOD-chain builder — output-identical to world/rle.py.

The reference builds worlds multi-core (one Task per core + Parallel.For,
WordBuilder.cs:41-96, World.cs:53); this host has ONE core, so the parallel
machine is the TPU: the whole soup -> RLE -> LOD chain pipeline runs as jitted
integer array programs (sorts, segment reductions, prefix sums — no float
rounding anywhere, so device results match numpy bit-for-bit), and only the
final packed tables cross the (slow, ~25 MB/s) device->host tunnel once.

Layout notes mirrored from rle.py:
- dedupe key: xz * (ymax+1) + (ymax - y) — (xz asc, y desc) order
- averaging: truncating integer channel means (sum // count)
- runs: air-before + solid per run, trailing air per column
- the LOD-L soup is the LOD0 *deduped* voxel set with (x>>L, z>>L, y>>L)
  coordinates — identical to rle._expand_soup + downsample, because expanding
  LOD0's runs reproduces exactly its deduped voxels in order.

Cascade (round 5): levels >= 1 no longer re-sort the full LOD0 soup.  Every
LOD-L color is the FLAT floor-mean of LOD0-averaged channel values over the
LOD0 deduped voxels inside the 2^L cube (rle.downsample routes the _same_
LOD0 soup through _dedupe_and_average at every level), so carrying per-voxel
channel SUMS + COUNTS from level to level reproduces each level's sums
exactly (integer addition; floor division only when materializing that
level's colors, never fed forward).  Input size then shrinks ~4x per level
(bucketed to keep the executable zoo bounded), which removes the flat
full-soup-sort cost per level (3.1 s/level at 2048^3, PERF_NOTES r5).

Requires a process with jax_enable_x64 (int64 dedupe keys) — the same process
mode the device voxelizer needs (assets/convert_cli.py sets it up).
"""
from __future__ import annotations

import functools

import numpy as np

from cpuvox_tpu.world.rle import WorldLOD

BIG32 = np.int32(2**31 - 1)


def _level_fns():
    """Build the jitted per-level kernels (lazy jax import).

    Returns (level, level_cascade):
    - level: the legacy full-soup kernel (packed rgb rows, count 1 each) —
      byte-identical to the round-3 kernel; used for LOD0 (and the
      cascade=False ablation path at every level).
    - level_cascade: consumes the previous level's deduped voxels with
      per-voxel channel sums + counts, collapses ONE octave, and emits the
      same packed tables plus the next level's sums/counts.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    BIG64 = jnp.int64(1) << jnp.int64(62)
    i32 = jnp.int32

    def _finish(key_s, xz_s, y_s, r_row, g_row, b_row, cn_row, height,
                scale_shift, N, want_sums):
        """Everything after the dedupe sort: group, average, runs, tables.

        key_s..cn_row are sorted-by-key per-row arrays; r_row/g_row/b_row are
        each row's channel CONTRIBUTION and cn_row its source count (1 for
        raw soup rows).  `height` is the target level's column height and
        `scale_shift` the target ABSOLUTE lod (voxel_scale = 1 << shift).
        """
        iota = lax.iota(i32, N)
        first = iota == 0
        top_y = height - 1

        def prev(a, fill=0):
            return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])

        # ---- dedupe & average (rle._dedupe_and_average)
        dv = key_s < BIG64
        new = dv & (first | (key_s != prev(key_s, -1)))
        gid = jnp.maximum(jnp.cumsum(new.astype(i32)) - 1, 0)
        cnt = jax.ops.segment_sum(jnp.where(dv, cn_row, 0), gid,
                                  num_segments=N)
        c1 = jnp.maximum(cnt, 1)
        rsum = jax.ops.segment_sum(jnp.where(dv, r_row, 0), gid, N)
        gsum = jax.ops.segment_sum(jnp.where(dv, g_row, 0), gid, N)
        bsum = jax.ops.segment_sum(jnp.where(dv, b_row, 0), gid, N)
        rs = rsum // c1
        gs = gsum // c1
        bs = bsum // c1
        colors = ((jnp.uint32(255) << 24) | (rs.astype(jnp.uint32) << 16)
                  | (gs.astype(jnp.uint32) << 8) | bs.astype(jnp.uint32))
        n_dedupe = new.sum()
        pk = jnp.where(new, iota, BIG32)
        _, xz_d, y_d = lax.sort((pk, xz_s, y_s), num_keys=1)
        dval = iota < n_dedupe

        # ---- solid runs: consecutive descending y within a column
        new_run = dval & (first | (xz_d != prev(xz_d, -1))
                          | (prev(y_d) - y_d != 1))
        rid = jnp.maximum(jnp.cumsum(new_run.astype(i32)) - 1, 0)
        s_len = jax.ops.segment_sum(dval.astype(i32), rid, N)
        s_top = jax.ops.segment_max(jnp.where(dval, y_d, -BIG32), rid, N)
        s_col = jax.ops.segment_max(jnp.where(dval, xz_d, -1), rid, N)
        n_runs = new_run.sum()
        rv = iota < n_runs
        s_bottom = s_top - s_len + 1
        vox_cum = jnp.cumsum(s_len) - s_len

        # ---- per-column grouping (rle.build_lod_from_voxels)
        new_col = rv & (first | (s_col != prev(s_col, -1)))
        col_ord = jnp.maximum(jnp.cumsum(new_col.astype(i32)) - 1, 0)
        air_before = jnp.where(new_col, top_y - s_top,
                               prev(s_bottom) - 1 - s_top)
        air_before = jnp.where(rv, air_before, 0)
        has_air = air_before > 0
        nxt_new = jnp.concatenate([new_col[1:], jnp.ones(1, bool)])
        nxt_rv = jnp.concatenate([rv[1:], jnp.zeros(1, bool)])
        last_in_col = rv & (nxt_new | ~nxt_rv)
        n_occ = new_col.sum()

        # packed per-column tables (dense [0, n_occ) prefixes)
        pk2 = jnp.where(new_col, iota, BIG32)
        _, occ_p, first_vox_p, ctop_p = lax.sort(
            (pk2, s_col, vox_cum, s_top), num_keys=1)
        pk3 = jnp.where(last_in_col, jnp.where(last_in_col, col_ord, 0), BIG32)
        _, cbot_p = lax.sort((pk3, s_bottom), num_keys=1)
        cval = iota < n_occ
        has_trail_p = cval & (cbot_p > 0)
        emit = jnp.where(rv, 1 + has_air.astype(i32), 0)
        runs_per_col_p = jax.ops.segment_sum(
            emit, jnp.where(rv, col_ord, N), num_segments=N + 1)[:N]
        runs_per_col_p = runs_per_col_p + has_trail_p.astype(i32)
        col_off_p = jnp.cumsum(runs_per_col_p) - runs_per_col_p
        trail_before_p = (jnp.cumsum(has_trail_p.astype(i32))
                          - has_trail_p.astype(i32))

        # ---- run slots: air-before + solid per run, trailing per column
        emit_cum = jnp.cumsum(emit)
        dest = emit_cum - emit + trail_before_p[jnp.where(rv, col_ord, 0)]
        colors_index = vox_cum - first_vox_p[jnp.where(rv, col_ord, 0)]
        k_air = jnp.where(rv & has_air, dest, BIG32)
        v_air = (jnp.int32(-1 << 16) | air_before).astype(i32)
        k_solid = jnp.where(rv, dest + has_air.astype(i32), BIG32)
        v_solid = ((colors_index << 16) | s_len).astype(i32)
        trail_dest = emit_cum + trail_before_p[jnp.where(rv, col_ord, 0)]
        k_trail = jnp.where(last_in_col & (s_bottom > 0), trail_dest, BIG32)
        v_trail = (jnp.int32(-1 << 16) | s_bottom).astype(i32)
        key3 = jnp.concatenate([k_air, k_solid, k_trail])
        val3 = jnp.concatenate([v_air, v_solid, v_trail])
        _, runs3 = lax.sort((key3, val3), num_keys=1)
        total_runs = (emit.sum() + has_trail_p.sum()).astype(i32)

        vs = jnp.int32(1) << scale_shift
        cmin_p = jnp.where(cval, cbot_p * vs, 0)
        cmax_p = jnp.where(cval, (ctop_p + 1) * vs, 0)
        # ONE per-column table so the host fetches it with a single sliced
        # transfer (each distinct slice program is another executable load).
        # Only 3 words/column cross the ~25 MB/s tunnel: [occ, runs|cmin<<16,
        # cmax] — col_offset is the cumsum of runs_per_col over the packed
        # occupied list and col_color_offset the per-column cumsum of solid
        # run lengths, both O(n) host numpy (_to_world_lod); runs_per_col and
        # cmin are < 2^16 for any y_dim <= 65535 (asserted by the caller)
        tab_col = jnp.stack(
            [occ_p, runs_per_col_p | (cmin_p << 16), cmax_p], axis=1)
        out = dict(colors=colors, xz_d=xz_d, y_d=y_d,
                   runs3=runs3, tab_col=tab_col,
                   n_dedupe=n_dedupe, n_runs_total=total_runs, n_occ=n_occ)
        if want_sums:
            # per-GROUP channel sums + source counts (aligned with colors:
            # groups packed at the front), the next cascade level's input
            out.update(rsum=rsum, gsum=gsum, bsum=bsum, cnt=cnt)
        return out

    @functools.partial(jax.jit, static_argnames=("N",))
    def level(x, z, y0, rgbp, valid, lod, y_dim, z_dim, N):
        # `lod` AND the world dims are TRACED so ONE executable serves every
        # chain level of every world — each distinct jit signature costs a
        # multi-second cached-executable load through this environment's
        # tunnel.  Coordinates arrive at LOD0 granularity and collapse here:
        # xz = (x>>L)*(Z>>L) + (z>>L), y>>L (identity at L=0) — exactly
        # rle.downsample's transform.
        xz = (x >> lod) * (z_dim >> lod) + (z >> lod)
        y = y0 >> lod
        height = y_dim >> lod

        yi = y.astype(jnp.int64)
        ymax = jnp.max(jnp.where(valid, yi, 0))
        key = jnp.where(valid, xz.astype(jnp.int64) * (ymax + 1) + (ymax - yi),
                        BIG64)
        # rgb rides the sort PACKED (one cargo word) and splits after —
        # keeps the big LOD0 soup sort at round-3 cargo width
        key_s, xz_s, y_s, rgb_s = lax.sort((key, xz, y, rgbp), num_keys=1)
        r = rgb_s & 0xFF
        g = (rgb_s >> 8) & 0xFF
        b = (rgb_s >> 16) & 0xFF
        one = jnp.ones((), i32)
        return _finish(key_s, xz_s, y_s, r, g, b,
                       jnp.broadcast_to(one, (N,)), height, lod, N,
                       want_sums=False)

    @functools.partial(jax.jit, static_argnames=("N",))
    def level_cascade(xz0, y0, rsum0, gsum0, bsum0, cnt0, valid, zbits_prev,
                      scale_shift, y_dim_prev, z_dim_prev, N):
        # Inputs are the PREVIOUS level's deduped voxels (packed front) with
        # per-voxel channel sums + LOD0-source counts; collapse one octave.
        # zbits_prev/dims are traced: one executable per input bucket N.
        x = xz0 >> zbits_prev
        z = xz0 & ((i32(1) << zbits_prev) - 1)
        xz = (x >> 1) * (z_dim_prev >> 1) + (z >> 1)
        y = y0 >> 1
        height = y_dim_prev >> 1

        yi = y.astype(jnp.int64)
        ymax = jnp.max(jnp.where(valid, yi, 0))
        key = jnp.where(valid, xz.astype(jnp.int64) * (ymax + 1) + (ymax - yi),
                        BIG64)
        key_s, xz_s, y_s, rs_s, gs_s, bs_s, cn_s = lax.sort(
            (key, xz, y, rsum0, gsum0, bsum0, cnt0), num_keys=1)
        return _finish(key_s, xz_s, y_s, rs_s, gs_s, bs_s, cn_s, height,
                       scale_shift, N, want_sums=True)

    return level, level_cascade


def _level_fn():
    """Back-compat: the legacy full-soup kernel alone (perf scripts)."""
    return _level_fns()[0]


def _fetch(dev_arr, n):
    """Device -> host of the first n rows, sliced at a bucket size so each
    distinct count doesn't compile a fresh slice program.  Buckets are powers
    of two, plus 1.5x-pow2 midpoints above 4M rows: the tunnel moves
    ~22-33 MB/s device->host (PERF_NOTES #10), so on the multi-MB LOD0 tables
    the up-to-2x pow2 overshoot costs seconds while one extra slice
    executable costs a one-time cached load."""
    if n == 0:
        return np.asarray(dev_arr[:1])[:0]
    k = 1 << int(np.ceil(np.log2(max(n, 2))))
    if n > (1 << 22) and (k // 2) * 3 // 2 >= n:
        k = (k // 2) * 3 // 2
    k = min(k, dev_arr.shape[0])
    return np.asarray(dev_arr[:k])[:n]


def _bucket_rows(n: int, cap: int) -> int:
    """Cascade input bucket: pow2 (1.5x midpoints above 4M, like _fetch),
    floor 8192 so tiny worlds share one executable, capped at the source
    array length."""
    k = max(8192, 1 << int(np.ceil(np.log2(max(n, 2)))))
    if n > (1 << 22) and (k // 2) * 3 // 2 >= n:
        k = (k // 2) * 3 // 2
    return min(k, cap)


def _to_world_lod(out, dims, lod) -> WorldLOD:
    gx, gz = dims[0] >> lod, dims[2] >> lod
    n_cols = gx * gz
    n_ded = int(out["n_dedupe"])
    n_runs = int(out["n_runs_total"])
    n_occ = int(out["n_occ"])
    colors = _fetch(out["colors"], n_ded).astype(np.uint32)
    runs = _fetch(out["runs3"], n_runs).astype(np.int32)
    tab = _fetch(out["tab_col"], n_occ)
    z0 = np.zeros(n_cols, np.int32)
    col_runs = z0.copy()
    col_offset = z0.copy()
    col_coloroff = z0.copy()
    col_min = z0.copy()
    col_max = z0.copy()
    if n_occ:
        occ = tab[:, 0].astype(np.int64)
        w1 = tab[:, 1].astype(np.int64) & 0xFFFFFFFF  # uint32 bits
        runs_p = (w1 & 0xFFFF).astype(np.int32)
        col_runs[occ] = runs_p
        # col_offset = exclusive cumsum of runs_per_col over the packed
        # occupied list (the device shipped only 3 words/col — see level())
        off_p = np.cumsum(runs_p.astype(np.int64)) - runs_p
        col_offset[occ] = off_p.astype(np.int32)
        # col_color_offset = exclusive per-column cumsum of solid run lengths
        solid = np.where(runs >= 0, runs & 0xFFFF, 0).astype(np.int64)
        per_col = np.add.reduceat(solid, off_p) if n_runs else \
            np.zeros(n_occ, np.int64)
        col_coloroff[occ] = (np.cumsum(per_col) - per_col).astype(np.int32)
        col_min[occ] = (w1 >> 16).astype(np.int32)
        col_max[occ] = tab[:, 2]
    return WorldLOD(tuple(dims), lod, col_offset, col_runs, col_coloroff,
                    col_min, col_max, runs, colors)


def build_lod_chain_device(xz, y, rgbp, valid, dims,
                           lod_levels: int = 6,
                           cascade: bool = True) -> list[WorldLOD]:
    """Full soup -> LOD chain on device; returns host WorldLODs.

    xz, y, rgbp (r | g<<8 | b<<16), valid: (N,) int32/bool device (or host)
    arrays — the raw LOD0 voxel soup, duplicates allowed.

    cascade=True (default) computes each level >= 1 from the PREVIOUS level's
    deduped voxels with carried channel sums/counts (bit-identical, ~4x less
    sort work per level); cascade=False re-sorts the full LOD0 deduped soup
    at every level (the round-3/4 path, kept as the measured ablation).
    """
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        raise RuntimeError("build_lod_chain_device requires jax_enable_x64")
    if int(dims[1]) > 65535:
        raise ValueError("tab_col packing needs y_dim <= 65535 "
                         f"(got {dims[1]})")
    level, level_cascade = _level_fns()
    xz = jnp.asarray(xz, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    rgbp = jnp.asarray(rgbp, jnp.int32)
    valid = jnp.asarray(valid, bool)
    N = xz.shape[0]
    dims = tuple(int(d) for d in dims)

    zbits = int(np.log2(dims[2]))
    x_raw = xz >> zbits  # Z is a power of two: exact shifts, no int division
    z_raw = xz & jnp.int32(dims[2] - 1)
    ydim = jnp.int32(dims[1])
    zdim = jnp.int32(dims[2])
    out0 = level(x_raw, z_raw, y, rgbp, valid, jnp.int32(0), ydim, zdim, N=N)

    if cascade:
        return _chain_cascade(out0, level_cascade, dims, zbits, lod_levels)

    outs = [out0]

    # LOD-L soup = LOD0's deduped voxels, coordinates collapsed by >> L
    # (rle._expand_soup reproduces exactly these, in this order)
    xz_d, y_d, colors0 = out0["xz_d"], out0["y_d"], out0["colors"]
    dval = jax.lax.iota(jnp.int32, N) < out0["n_dedupe"]
    x0 = xz_d >> zbits
    z0 = xz_d & jnp.int32(dims[2] - 1)
    c = colors0.astype(jnp.uint32)
    rgb_d = (((c >> 16) & 0xFF) | (((c >> 8) & 0xFF) << 8)
             | ((c & 0xFF) << 16)).astype(jnp.int32)
    if lod_levels > 1:
        outs.append(level(x0, z0, y_d, rgb_d, dval, jnp.int32(1), ydim, zdim,
                          N=N))
    # Depth-2 dispatch window (ADVICE r3): dispatching every level before any
    # fetch maximized overlap but kept all levels' padded outputs (~48N bytes
    # each) live on device at once — ~3x the round-2 peak, an OOM risk on
    # large soups.  A window of two keeps the overlap that matters (the big
    # tunnel-bound LOD0 fetch still runs while LOD1 computes, and each later
    # level's compute overlaps the previous level's fetch) while capping the
    # device-resident peak at ~2 level outputs + the shared deduped soup.
    worlds = []
    for L in range(lod_levels):
        o = outs[L]
        outs[L] = None  # drop the reference before the blocking fetch
        worlds.append(_to_world_lod(o, dims, L))
        del o
        nxt = L + 2
        if 1 <= nxt < lod_levels:
            outs.append(level(x0, z0, y_d, rgb_d, dval, jnp.int32(nxt), ydim,
                              zdim, N=N))
    return worlds


def _chain_cascade(out0, level_cascade, dims, zbits, lod_levels):
    """Cascade chain: level L from level L-1's deduped sums (see module doc).

    Dispatch order interleaves compute and fetch like the legacy window: the
    scalar n_dedupe read syncs level L-1's compute, level L is dispatched,
    THEN level L-1's big table fetch runs (overlapping level L's compute).
    Device peak is out0 + two shrinking cascade outputs — below the legacy
    window's peak.
    """
    import jax.numpy as jnp

    outs = [out0]
    worlds = []
    for L in range(1, lod_levels):
        prev = outs[-1]
        n_prev = int(prev["n_dedupe"])  # syncs level L-1's compute
        nl = _bucket_rows(n_prev, int(prev["xz_d"].shape[0]))
        if L == 1:
            # LOD1 averages LOD0's AVERAGED colors (rle.downsample feeds the
            # deduped LOD0 set through _dedupe_and_average): unit counts,
            # channel values from the materialized LOD0 colors
            c = prev["colors"][:nl].astype(jnp.uint32)
            rs0 = ((c >> 16) & 0xFF).astype(jnp.int32)
            gs0 = ((c >> 8) & 0xFF).astype(jnp.int32)
            bs0 = (c & 0xFF).astype(jnp.int32)
            cn0 = jnp.ones(nl, jnp.int32)
        else:
            rs0 = prev["rsum"][:nl]
            gs0 = prev["gsum"][:nl]
            bs0 = prev["bsum"][:nl]
            cn0 = prev["cnt"][:nl]
        val = jnp.arange(nl, dtype=jnp.int32) < n_prev
        zb_prev = zbits - (L - 1)
        out_l = level_cascade(
            prev["xz_d"][:nl], prev["y_d"][:nl], rs0, gs0, bs0, cn0, val,
            jnp.int32(zb_prev), jnp.int32(L),
            jnp.int32(dims[1] >> (L - 1)), jnp.int32(dims[2] >> (L - 1)),
            N=nl)
        outs.append(out_l)
        # fetch level L-1 while level L computes
        worlds.append(_to_world_lod(prev, dims, L - 1))
        outs[L - 1] = None
    worlds.append(_to_world_lod(outs[-1], dims, lod_levels - 1))
    return worlds
