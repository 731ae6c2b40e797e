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

Requires a process with jax_enable_x64 (int64 dedupe keys) — the same process
mode the device voxelizer needs (assets/convert_cli.py sets it up).
"""
from __future__ import annotations

import functools

import numpy as np

from cpuvox_tpu.world.rle import WorldLOD

BIG32 = np.int32(2**31 - 1)


def _level_fn():
    """Build the jitted per-level kernel (lazy jax import)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    BIG64 = jnp.int64(1) << jnp.int64(62)

    @functools.partial(jax.jit, static_argnames=("N",))
    def level(x, z, y0, rgbp, valid, lod, y_dim, z_dim, N):
        # `lod` AND the world dims are TRACED so ONE executable serves every
        # chain level of every world — each distinct jit signature costs a
        # multi-second cached-executable load through this environment's
        # tunnel.  Coordinates arrive at LOD0 granularity and collapse here:
        # xz = (x>>L)*(Z>>L) + (z>>L), y>>L (identity at L=0) — exactly
        # rle.downsample's transform.
        i32 = jnp.int32
        xz = (x >> lod) * (z_dim >> lod) + (z >> lod)
        y = y0 >> lod
        height = y_dim >> lod
        top_y = height - 1
        iota = lax.iota(i32, N)
        first = iota == 0

        def prev(a, fill=0):
            return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])

        # ---- dedupe & average (rle._dedupe_and_average)
        yi = y.astype(jnp.int64)
        ymax = jnp.max(jnp.where(valid, yi, 0))
        key = jnp.where(valid, xz.astype(jnp.int64) * (ymax + 1) + (ymax - yi),
                        BIG64)
        key_s, xz_s, y_s, rgb_s = lax.sort((key, xz, y, rgbp), num_keys=1)
        dv = key_s < BIG64
        new = dv & (first | (key_s != prev(key_s, -1)))
        gid = jnp.maximum(jnp.cumsum(new.astype(i32)) - 1, 0)
        r = rgb_s & 0xFF
        g = (rgb_s >> 8) & 0xFF
        b = (rgb_s >> 16) & 0xFF
        cnt = jax.ops.segment_sum(dv.astype(i32), gid, num_segments=N)
        c1 = jnp.maximum(cnt, 1)
        rs = jax.ops.segment_sum(jnp.where(dv, r, 0), gid, N) // c1
        gs = jax.ops.segment_sum(jnp.where(dv, g, 0), gid, N) // c1
        bs = jax.ops.segment_sum(jnp.where(dv, b, 0), gid, N) // c1
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

        vs = jnp.int32(1) << lod
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
        return dict(colors=colors, xz_d=xz_d, y_d=y_d,
                    runs3=runs3, tab_col=tab_col,
                    n_dedupe=n_dedupe, n_runs_total=total_runs, n_occ=n_occ)

    return level


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
                           lod_levels: int = 6) -> list[WorldLOD]:
    """Full soup -> LOD chain on device; returns host WorldLODs.

    xz, y, rgbp (r | g<<8 | b<<16), valid: (N,) int32/bool device (or host)
    arrays — the raw LOD0 voxel soup, duplicates allowed.
    """
    import jax
    import jax.numpy as jnp

    if not jax.config.jax_enable_x64:
        raise RuntimeError("build_lod_chain_device requires jax_enable_x64")
    if int(dims[1]) > 65535:
        raise ValueError("tab_col packing needs y_dim <= 65535 "
                         f"(got {dims[1]})")
    level = _level_fn()
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
