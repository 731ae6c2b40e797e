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

from cpuvox_tpu.utils.colors import pack_argb
from cpuvox_tpu.world.rle import WorldLOD


REC = 8  # ints per split-layout column record (32 B aligned gather row)
REC_META = 4  # leading meta ints in an inline record: n_runs, color_off, cmin, cmax
INLINE_MAX_RUNS = 60  # inline runs into the record while 4 + max_runs <= 64 ints
LITE_RUNS = 4  # legacy fixed lite tier (kept for tests); builds now pick an
# ADAPTIVE tier per world — see _pick_lite_tier.  Deep-RLE worlds (mill
# max_runs=45 -> 128-byte packed records = 4 gather-row units) pay the full
# row width on EVERY gated fetch although most visited columns have far fewer
# runs (mill: median 9, 88% <= 24); the gated march fetches lite rows (tier 24
# = 2 units) and takes a second, per-lane-narrow fetch only for "deep" cells
# (n_runs > tier).  Lite rows are ALWAYS 16-bit packed and carry the column's
# total solid length in slot 0 bits 8+ (n_runs in bits 0-7) so the reversed
# iteration direction can reconstruct forward color indices from a TRUNCATED
# run prefix (cidx_fwd = total_solid - cum_before_rev - length).
# (one gather row per visited cell beats the split record+runs double gather up
# to ~256-byte rows; deeper worlds fall back to the split layout)
# occupancy tiles: one 32-byte row per OCC_TILE_X x OCC_TILE_Z block of columns
# per LOD — [4 bitmap words (bit = column has runs), tile cmin, tile cmax, 2 pad].
# The march gathers ONE tile row per distinct tile a ray crosses per chunk
# (instead of one record row per visited CELL) and fetches full records only
# for visits whose bit is set — the TPU-native equivalent of the reference's
# empty-column `continue` (DrawSegmentRayJob.cs:251-256): on mostly-air worlds
# the per-visited-cell gather row (the round-2 bottleneck) disappears.
OCC_TILE_X = 16
OCC_TILE_Z = 8
OCC_ROW = 8  # int32 per tile row (32 B — one gather-row unit)

INLINE_MAX_COLORS = 24  # ALSO inline the column's voxel colors (ARGB mode) when
# every column has <= this many voxels: phase 1 then writes final ARGB pixels
# and the ~2M-element color-resolve gather (a flat ~75ms on v5e at 1080p)
# disappears from phase 2.  Colors ride with bit31 (the alpha MSB, always 1 for
# opaque ARGB) CLEARED so the kernel's "unwritten < 0" sentinel keeps working;
# the final skybox pass restores it.


@dataclasses.dataclass
class DeviceWorld:
    """Flat world arrays (numpy on host; pass through jnp.asarray / device_put).

    Column metadata is packed into one (total_cols, 8) int32 record —
    [n_runs, run_offset, color_offset, world_min, world_max, pad...] — so a column
    fetch is a single 32-byte gather row (TPU gathers cost per-row, not per-byte;
    this is the same locality argument as the reference's RLEColumn header struct,
    World.cs:161-173).  ``runs_rev`` stores every column's runs reversed in place so
    the upward-iteration camera path (DrawSegmentRayJob.cs:432-437) is also a
    contiguous slice-gather.
    """

    dims: tuple[int, int, int]
    lod_levels: int
    col_base: np.ndarray  # int32 [8]
    grid_z: np.ndarray  # int32 [8]  (Z >> lod per level)
    col_rec: np.ndarray | None  # int32 [total_cols, REC] (split layout)
    runs: np.ndarray | None  # int32 [total_runs] (split layout)
    runs_rev: np.ndarray | None  # int32 [total_runs] (per-column reversed)
    colors: np.ndarray  # uint32 [1 + total_colors], [0] = skybox
    max_runs: int  # max col_runs over every LOD (bounds the kernel's run loop)
    # inline layout (used when max_runs <= INLINE_MAX_RUNS): the whole column —
    # meta AND its runs — rides in ONE gather row, halving the per-visited-cell
    # gather count on the hot path.  rec_rev holds the runs pre-reversed for the
    # upward iteration direction (DrawSegmentRayJob.cs:432-437).
    rec_fwd: np.ndarray | None = None  # int32 [total_cols, 4 + padded max_runs]
    rec_rev: np.ndarray | None = None
    # lite records (adaptive tier, see _pick_lite_tier): [n_runs | total_solid
    # << 8, color_off, cmin, cmax, packed run words...] in ceil((4 + ceil(t/2))
    # / 8) * 8 int32 — fewer gather-row units than the full record; the gated
    # march fetches these and falls back to a narrow full fetch for deep cells
    lite_fwd: np.ndarray | None = None  # int32 [total_cols, row]
    lite_rev: np.ndarray | None = None
    lite_runs: int = 0  # the adaptive tier t (0 = lite not built)
    # ARGB mode (INLINE_MAX_COLORS): the column's voxel colors are ALSO inline
    # (alpha-MSB cleared), appended after the runs; max_col_colors > 0 marks it
    max_col_colors: int = 0
    # LOD0 voxel count (colors.shape[0]-1 counts the CONCATENATED LOD chain,
    # ~25% more — report this one when comparing against BASELINE's 36.9M)
    lod0_voxels: int = 0
    # occupancy tiles (see OCC_TILE_X): per-LOD emptiness bitmaps + tile
    # cmin/cmax, all LODs concatenated like col_base
    occ_tiles: np.ndarray | None = None  # int32 [n_tiles, OCC_ROW]
    tile_base: np.ndarray | None = None  # int32 [8]
    tile_gz: np.ndarray | None = None  # int32 [8] (tiles per x-row per LOD)
    # fraction of LOD0 columns with zero runs (drives the occupancy auto policy)
    empty_frac: float = 0.0
    # world-Y bounds of SOLID content over every LOD (col_min/col_max extremes
    # of occupied columns; world units).  The march kills a ray whose frozen
    # frustum window provably cleared these bounds — output-exact (see
    # raymarch._rasterize_step solid-bound kill) and strictly stronger than the
    # reference's world-box retire (DrawSegmentRayJob.cs:261-281) whenever the
    # content tops out below the world box.  None = kill disabled: any
    # DeviceWorld built outside build_device_world (dynamic surface worlds,
    # EditableWorld snapshots) must OPT IN with true bounds — a stale/too-low
    # bound would wrongly retire writable rays.
    solid_min_y: float | None = None
    solid_max_y: float | None = None
    # world-sharded active window [tx0, tz0, t_log2, W] (parallel/world_shard
    # fills this on ACTIVE worlds only; None = plain replicated layout)
    win: np.ndarray | None = None


def build_occ_tiles(lods: list[WorldLOD]):
    """Per-LOD occupancy tiles: (occ int32 [n_tiles, OCC_ROW], tile_base [8],
    tile_gz [8]).

    Tile (tx, tz) at LOD l covers column cells x in [tx*16, tx*16+16),
    z in [tz*8, tz*8+8); bit for local cell (lx, lz) lives in word (lx*8+lz)>>5
    at bit (lx*8+lz)&31.  Words 4/5 hold min(col_min)/max(col_max) over the
    tile's NONEMPTY columns (BIG/-BIG for all-empty tiles) for the conservative
    frustum-window gate."""
    BIGC = np.int32(1 << 24)
    tile_base = np.zeros(8, np.int32)
    tile_gz = np.ones(8, np.int32)
    parts = []
    base = 0
    lx = np.arange(OCC_TILE_X)
    lz = np.arange(OCC_TILE_Z)
    bitidx = (lx[:, None] * OCC_TILE_Z + lz[None, :]).reshape(-1)  # (128,)
    shifts = (bitidx & 31).astype(np.uint32)
    word_of = bitidx >> 5
    for i, w in enumerate(lods):
        gx, gz = w.dims[0] >> w.lod, w.dims[2] >> w.lod
        tgx = -(-gx // OCC_TILE_X)
        tgz = -(-gz // OCC_TILE_Z)
        tile_base[i] = base
        tile_gz[i] = tgz
        occ2d = (w.col_runs > 0).reshape(gx, gz)
        cmin2d = np.where(occ2d.reshape(-1), w.col_min, BIGC).reshape(gx, gz)
        cmax2d = np.where(occ2d.reshape(-1), w.col_max, -BIGC).reshape(gx, gz)

        def tiles(a, pad_val):
            ap = np.pad(a, ((0, tgx * OCC_TILE_X - gx), (0, tgz * OCC_TILE_Z - gz)),
                        constant_values=pad_val)
            return ap.reshape(tgx, OCC_TILE_X, tgz, OCC_TILE_Z).transpose(
                0, 2, 1, 3).reshape(tgx, tgz, OCC_TILE_X * OCC_TILE_Z)

        bits = tiles(occ2d, False).astype(np.uint32) << shifts[None, None, :]
        row = np.zeros((tgx, tgz, OCC_ROW), np.uint32)
        for wd in range(4):
            sel = bits[:, :, word_of == wd]
            row[:, :, wd] = np.bitwise_or.reduce(sel, axis=2) if sel.size else 0
        row[:, :, 4] = tiles(cmin2d, BIGC).min(axis=2).astype(np.int32) \
            .view(np.uint32)
        row[:, :, 5] = tiles(cmax2d, -BIGC).max(axis=2).astype(np.int32) \
            .view(np.uint32)
        parts.append(row.reshape(-1, OCC_ROW))
        base += tgx * tgz
    lod_levels = len(lods)
    tile_base[lod_levels:] = tile_base[lod_levels - 1]
    tile_gz[lod_levels:] = tile_gz[lod_levels - 1]
    occ = np.concatenate(parts).view(np.int32)
    return occ, tile_base, tile_gz


def reverse_runs(runs: np.ndarray, col_offset: np.ndarray, col_runs: np.ndarray
                 ) -> np.ndarray:
    """Per-column reversed copy of the packed runs array (same offsets)."""
    n = runs.shape[0]
    occupied = np.nonzero(col_runs > 0)[0]
    starts = col_offset[occupied].astype(np.int64)
    counts = col_runs[occupied].astype(np.int64)
    # index i within column -> start + (count - 1 - (i - start))
    idx = np.arange(n, dtype=np.int64)
    col_of = np.zeros(n, np.int64)
    col_of[starts] = 1
    col_of = np.cumsum(col_of) - 1
    s = starts[col_of]
    c = counts[col_of]
    return runs[s + (c - 1) - (idx - s)]


def build_device_world(lods: list[WorldLOD],
                       skybox_rgb: tuple[int, int, int] = (25, 25, 25),
                       inline_colors: bool = False) -> DeviceWorld:
    """inline_colors enables ARGB mode (phase 1 writes final colors, no resolve
    gather) — measured a net LOSS at 1080p/terrain2048 on v5e (the 3x wider
    record rows cost more in the march gather than the resolve saves), so it is
    opt-in; kept because the tradeoff may flip on other content/hardware."""
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

    co = np.concatenate(col_offset).astype(np.int32)
    cr = np.concatenate(col_runs).astype(np.int32)
    runs = np.concatenate(runs_parts).astype(np.int32)
    n_cols = co.shape[0]
    rec = np.zeros((n_cols, REC), np.int32)
    rec[:, 0] = cr
    rec[:, 1] = co
    rec[:, 2] = np.concatenate(col_cols).astype(np.int32)
    rec[:, 3] = np.concatenate(col_min).astype(np.int32)
    rec[:, 4] = np.concatenate(col_max).astype(np.int32)

    max_runs = max(max_runs, 1)
    pad = np.zeros(max_runs, np.int32)  # tail pad: slice-gathers never clamp/shift
    runs_fwd = np.concatenate([runs, pad])
    runs_bwd = np.concatenate([reverse_runs(runs, co, cr), pad])
    colors = np.concatenate(
        [[pack_argb(*skybox_rgb)], *colors_parts]).astype(np.uint32)
    dw = DeviceWorld(
        dims=lods[0].dims,
        lod_levels=lod_levels,
        col_base=col_base,
        grid_z=grid_z,
        col_rec=rec,
        runs=runs_fwd,
        runs_rev=runs_bwd,
        colors=colors,
        max_runs=max_runs,
        lod0_voxels=int(lods[0].colors.shape[0]),
    )
    dw.occ_tiles, dw.tile_base, dw.tile_gz = build_occ_tiles(lods)
    n0 = lods[0].col_runs.shape[0]
    dw.empty_frac = float((lods[0].col_runs == 0).sum() / max(n0, 1))
    occ_any = cr > 0
    if occ_any.any():
        dw.solid_min_y = float(rec[occ_any, 3].min())
        dw.solid_max_y = float(rec[occ_any, 4].max())
    if max_runs <= INLINE_MAX_RUNS:
        # per-column voxel-color count = sum of the column's solid-run lengths
        # (offsets are NOT monotone in column order for voxel-soup worlds)
        solid_len = np.where(runs_fwd >= 0, runs_fwd & 0xFFFF, 0).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(solid_len)])
        off64 = co.astype(np.int64)
        col_colors = csum[off64 + cr] - csum[off64]
        max_cc = int(col_colors.max()) if col_colors.size else 0
        mcc = max_cc if inline_colors and 0 < max_cc <= INLINE_MAX_COLORS else 0
        dw.rec_fwd = _inline_records(rec, runs_fwd, max_runs, colors, mcc)
        dw.rec_rev = _inline_records(rec, runs_bwd, max_runs, colors, mcc)
        dw.max_col_colors = mcc
        dw.col_rec = dw.runs = dw.runs_rev = None
        # adaptive lite tier: pick the narrowest packed row whose expected
        # gather cost (units + deep-cell fallback) beats the full record
        tier = _pick_lite_tier(cr, max_runs, mcc)
        if tier:
            total_solid = col_colors  # sum of the column's solid-run lengths
            dw.lite_fwd = _lite_records(rec, runs_fwd, tier, total_solid)
            dw.lite_rev = _lite_records(rec, runs_bwd, tier, total_solid)
            dw.lite_runs = tier
    return dw


def _pick_lite_tier(col_runs: np.ndarray, max_runs: int, mcc: int) -> int:
    """Choose the adaptive lite-record tier (run capacity) for a world, or 0.

    Candidate tiers are the largest run counts that fit 1, 2, 3... 32-byte
    gather-row units with 16-bit packing (t = 16*u - 8).  Expected per-fetch
    cost of a tier = its units + (1 - coverage) * (full record units + a
    measured penalty for the deep-cell fallback: the narrow full fetch plus
    occasional prefix-cap rewind chunks — PERF_NOTES findings 16/17).
    Coverage is over NONEMPTY columns of the whole concatenated LOD chain
    (empty columns never reach the gated fetch)."""
    if mcc:  # ARGB mode inlines colors; the lite split doesn't apply
        return 0
    ne = col_runs[col_runs > 0]
    if not ne.size:
        return 0
    full_units = (REC_META + packed_run_words(max_runs) + 7) // 8
    if full_units <= 1:
        return 0
    DEEP_PENALTY = 2.0
    best_tier, best_cost = 0, float(full_units) - 0.25
    for u in range(1, full_units):
        t = 2 * (8 * u - REC_META)  # meta + ceil(t/2) words fill u units exactly
        if t >= max_runs:
            break
        cov = float((ne <= t).mean())
        cost = u + (1.0 - cov) * (full_units + DEEP_PENALTY)
        if cost < best_cost:
            best_tier, best_cost = t, cost
    return best_tier


def _lite_records(rec: np.ndarray, runs: np.ndarray, tier: int,
                  total_solid: np.ndarray) -> np.ndarray:
    """Lite record rows: [n_runs | total_solid << 8, color_off, cmin, cmax,
    16-bit packed run words for the first `tier` runs].  total_solid rides in
    slot 0 so the reversed-iteration fetch can reconstruct forward color
    indices from a truncated run prefix (deep columns beyond the tier take the
    narrow full fetch instead, so their truncated words are never decoded)."""
    out = _inline_records(rec, runs, tier, np.zeros(1, np.uint32), 0)
    assert packed_run_words(tier) != tier, tier  # lite rows are always packed
    n_runs = rec[:, 0].astype(np.int64)
    assert int(n_runs.max(initial=0)) < (1 << 8)
    ts = total_solid.astype(np.int64)
    assert int(ts.max(initial=0)) < (1 << 23)
    out[:, 0] = (n_runs | (ts << 8)).astype(np.int32)
    return out


def packed_run_words(max_runs: int, max_cc: int = 0) -> int:
    """Run-region width in int32 words for the inline record, and whether the
    16-bit two-runs-per-word packing applies.  Packing halves the run region
    (run -> air bit | 15-bit length; the color index is RECONSTRUCTED after the
    gather by a cumulative sum of solid lengths — raymarch._fetch_columns), and
    is used exactly when it shrinks the padded row (deep-RLE worlds: mill's
    max_runs=45 records drop 224 B -> 128 B = 7 -> 4 gather-row units)."""
    rw_full = ((REC_META + max_runs + max_cc + 7) // 8) * 8
    w_packed = (max_runs + 1) // 2
    rw_packed = ((REC_META + w_packed + max_cc + 7) // 8) * 8
    return w_packed if rw_packed < rw_full else max_runs


def _inline_records(rec: np.ndarray, runs: np.ndarray, max_runs: int,
                    colors: np.ndarray, max_cc: int = 0) -> np.ndarray:
    """Pack [n_runs, color_off, cmin, cmax, run0..run_{max_runs-1}
    (, argb0..argb_{max_cc-1})] per column into one row (padded to a 32-byte
    multiple) so a column fetch is a single gather.  Inline colors carry the
    alpha MSB cleared (see INLINE_MAX_COLORS).  When packed_run_words() says
    the 16-bit packing shrinks the row, two runs ride per int32 word."""
    n_cols = rec.shape[0]
    k = np.arange(max_runs, dtype=np.int64)[None, :]
    idx = rec[:, 1].astype(np.int64)[:, None] + k  # run_offset + k (tail-padded)
    vals = runs[np.minimum(idx, runs.shape[0] - 1)]
    vals = np.where(k < rec[:, 0:1], vals, 0)

    rwords = packed_run_words(max_runs, max_cc)
    if rwords != max_runs:  # 16-bit packing
        length = vals & np.int32(0xFFFF)
        assert int(length.max(initial=0)) < 0x8000, "run length needs 15 bits"
        half = (length | np.where(vals < 0, np.int32(0x8000), np.int32(0))
                ).astype(np.uint32)
        if max_runs % 2:
            half = np.concatenate(
                [half, np.zeros((n_cols, 1), np.uint32)], axis=1)
        words = (half[:, 0::2] | (half[:, 1::2] << np.uint32(16))
                 ).astype(np.uint32).view(np.int32)
    else:
        words = vals

    rw = ((REC_META + rwords + max_cc + 7) // 8) * 8
    out = np.zeros((n_cols, rw), np.int32)
    out[:, 0] = rec[:, 0]
    out[:, 1] = rec[:, 2]  # color_off
    out[:, 2] = rec[:, 3]  # world min
    out[:, 3] = rec[:, 4]  # world max
    out[:, REC_META:REC_META + rwords] = words
    if max_cc:
        kc = np.arange(max_cc, dtype=np.int64)[None, :]
        cidx = rec[:, 2].astype(np.int64)[:, None] + kc  # global color offset
        cvals = (colors[np.minimum(cidx, colors.shape[0] - 1)]
                 & np.uint32(0x7FFFFFFF)).astype(np.int32)
        out[:, REC_META + rwords:REC_META + rwords + max_cc] = cvals
    return out
