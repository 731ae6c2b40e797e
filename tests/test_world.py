"""RLE world tests: vectorized builder vs an independent slow transliteration of
WordBuilder.RLEColumnBuilder.ToFinalColumn (reference WordBuilder.cs:181-268), plus
structural invariants and downsampling."""
import numpy as np
import pytest

from cpuvox_tpu.world import rle


def slow_build_column(voxels, height):
    """Direct transliteration of ToFinalColumn for one column.

    voxels: list of (y, (r, g, b)) possibly with duplicates, any order.
    Returns (runs as (colors_index, length, is_air) tuples, colors list of (r,g,b)).
    """
    if not voxels:
        return [], []
    voxels = sorted(voxels, key=lambda v: -v[0])
    # dedupe with averaging (truncating int division)
    deduped = []
    i = 0
    while i < len(voxels):
        j = i
        rs = gs = bs = 0
        while j < len(voxels) and voxels[j][0] == voxels[i][0]:
            rs += voxels[j][1][0]
            gs += voxels[j][1][1]
            bs += voxels[j][1][2]
            j += 1
        n = j - i
        deduped.append((voxels[i][0], (rs // n, gs // n, bs // n)))
        i = j
    top_y = height - 1
    runs = []
    i = 0
    while i < len(deduped):
        y = deduped[i][0]
        air = top_y - y
        if air > 0:
            runs.append((-1, air, True))
            top_y -= air
        run_len = 1
        while i + run_len < len(deduped) and top_y - run_len == deduped[i + run_len][0]:
            run_len += 1
        runs.append((i, run_len, False))
        top_y -= run_len
        i += run_len
    if top_y >= 0:
        runs.append((-1, top_y + 1, True))
    return runs, [c for _, c in deduped]


def random_voxels(rng, dims, n, dup_frac=0.3):
    X, Y, Z = dims
    n_dup = int(n * dup_frac)
    x = rng.integers(0, X, n)
    z = rng.integers(0, Z, n)
    y = rng.integers(0, Y, n)
    # duplicates of existing voxels with different colors
    di = rng.integers(0, n, n_dup)
    x, z, y = np.append(x, x[di]), np.append(z, z[di]), np.append(y, y[di])
    r = rng.integers(0, 256, x.shape[0]).astype(np.uint8)
    g = rng.integers(0, 256, x.shape[0]).astype(np.uint8)
    b = rng.integers(0, 256, x.shape[0]).astype(np.uint8)
    return x, y, z, (r, g, b)


def build(dims, x, y, z, rgb, lod=0):
    Z = dims[2]
    xz = (np.asarray(x) >> lod) * (Z >> lod) + (np.asarray(z) >> lod)
    return rle.build_lod_from_voxels(dims, lod, xz, np.asarray(y) >> lod, rgb)


class TestBuilder:
    def test_single_voxel(self):
        dims = (8, 8, 8)
        w = build(dims, [3], [2], [5], (np.array([10]), np.array([20]), np.array([30])))
        runs, colors = rle.get_column(w, 3, 5)
        assert len(runs) == 3  # air above, solid, air below
        assert rle.run_is_air(runs[0]) and not rle.run_is_air(runs[1])
        assert rle.run_length(runs[0]) == 5  # y=7..3 air
        assert rle.run_length(runs[1]) == 1
        assert rle.run_length(runs[2]) == 2  # y=1..0 air
        assert colors[0] == rle.pack_run(0, 0) * 0 + np.uint32(0xFF0A141E)
        assert w.col_min[w.column_index(3, 5)] == 2
        assert w.col_max[w.column_index(3, 5)] == 3
        rle.validate_world(w)

    def test_voxel_at_top(self):
        dims = (4, 8, 4)
        w = build(dims, [0], [7], [0], (np.array([1]), np.array([2]), np.array([3])))
        runs, _ = rle.get_column(w, 0, 0)
        assert len(runs) == 2  # solid at top, air below
        assert not rle.run_is_air(runs[0])

    def test_full_column(self):
        dims = (4, 4, 4)
        y = np.arange(4)
        w = build(dims, [1] * 4, y, [1] * 4,
                  (np.arange(4, dtype=np.uint8),) * 3)
        runs, colors = rle.get_column(w, 1, 1)
        assert len(runs) == 1
        assert rle.run_length(runs[0]) == 4
        # colors top-first: y=3 first
        assert colors[0] & 0xFF == 3
        assert colors[3] & 0xFF == 0
        rle.validate_world(w)

    def test_duplicate_color_averaging(self):
        dims = (4, 4, 4)
        w = build(dims, [0, 0], [1, 1], [0, 0],
                  (np.array([10, 21]), np.array([0, 0]), np.array([0, 5])))
        _, colors = rle.get_column(w, 0, 0)
        r = (colors[0] >> 16) & 0xFF
        b = colors[0] & 0xFF
        assert r == 15  # (10+21)//2
        assert b == 2  # (0+5)//2

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_vs_slow_reference(self, seed):
        rng = np.random.default_rng(seed)
        dims = (16, 32, 8)
        x, y, z, rgb = random_voxels(rng, dims, 400)
        w = build(dims, x, y, z, rgb)
        rle.validate_world(w)

        # compare every column against the slow transliteration
        per_col = {}
        for i in range(x.shape[0]):
            per_col.setdefault((x[i], z[i]), []).append(
                (int(y[i]), (int(rgb[0][i]), int(rgb[1][i]), int(rgb[2][i])))
            )
        for (cx, cz), voxels in per_col.items():
            runs, colors = rle.get_column(w, cx, cz)
            exp_runs, exp_colors = slow_build_column(voxels, dims[1])
            assert len(runs) == len(exp_runs), (cx, cz)
            for k, (eci, el, eair) in enumerate(exp_runs):
                assert int(rle.run_length(runs[k])) == el, (cx, cz, k)
                assert bool(rle.run_is_air(runs[k])) == eair
                if not eair:
                    assert int(rle.run_colors_index(runs[k])) == eci
            got = [((int(c) >> 16) & 0xFF, (int(c) >> 8) & 0xFF, int(c) & 0xFF)
                   for c in colors]
            assert got == exp_colors, (cx, cz)
        # untouched columns are empty
        empties = np.setdiff1d(np.arange(w.n_cols),
                               [w.column_index(cx, cz) for cx, cz in per_col])
        assert np.all(w.col_runs[empties] == 0)


class TestDownsample:
    def test_single_voxel_collapses(self):
        dims = (8, 8, 8)
        w0 = build(dims, [4], [5], [6], (np.array([100]), np.array([110]), np.array([120])))
        w1 = rle.downsample(w0, 1)
        assert w1.lod == 1
        assert w1.grid_dims == (4, 4)
        runs, colors = rle.get_column(w1, 4, 6)  # full-res coords still address columns
        assert len(runs) == 3
        assert rle.run_length(runs[1]) == 1
        assert w1.col_min[w1.column_index(4, 6)] == 2 * 2  # y=5>>1=2, scaled by 2
        rle.validate_world(w1)

    def test_merge_averages_colors(self):
        dims = (4, 4, 4)
        # two voxels that merge into one LOD1 cell: (0,0,0) and (1,1,1)
        w0 = build(dims, [0, 1], [0, 1], [0, 1],
                   (np.array([10, 20]), np.array([0, 0]), np.array([0, 0])))
        w1 = rle.downsample(w0, 1)
        _, colors = rle.get_column(w1, 0, 0)
        assert ((colors[0] >> 16) & 0xFF) == 15

    @pytest.mark.parametrize("extra", [1, 2, 3])
    def test_random_invariants_and_conservation(self, extra):
        rng = np.random.default_rng(7)
        dims = (16, 16, 16)
        x, y, z, rgb = random_voxels(rng, dims, 300)
        w0 = build(dims, x, y, z, rgb)
        wl = rle.downsample(w0, extra)
        rle.validate_world(wl)
        # every LOD0 solid voxel maps into a solid LOD cell and vice versa
        lod0_cells = set(zip(x >> extra, y >> extra, z >> extra))
        count = 0
        gx, gz = wl.grid_dims
        for cx in range(gx):
            for cz in range(gz):
                runs, _ = rle.get_column(wl, cx << extra, cz << extra)
                if len(runs) == 0:
                    continue
                top = wl.height - 1
                for rn in runs:
                    ln = int(rle.run_length(rn))
                    if not rle.run_is_air(rn):
                        for yy in range(top - ln + 1, top + 1):
                            assert (cx, yy, cz) in lod0_cells
                            count += 1
                    top -= ln
        assert count == len(lod0_cells)

    def test_chain(self):
        rng = np.random.default_rng(3)
        dims = (16, 16, 16)
        x, y, z, rgb = random_voxels(rng, dims, 100)
        w0 = build(dims, x, y, z, rgb)
        chain = rle.build_lod_chain(w0, 4)
        assert [w.lod for w in chain] == [0, 1, 2, 3]
        for w in chain:
            rle.validate_world(w)


class TestPackedInlineRecords:
    """device.py 16-bit run packing: two runs per int32 word, color index
    reconstructed post-gather (raymarch._fetch_columns) — must round-trip
    bit-exactly against the unpacked encoding, both iteration directions."""

    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp

        from cpuvox_tpu.render import device as dv
        from cpuvox_tpu.render import raymarch as rm

        rng = np.random.default_rng(7)
        dims = (8, 64, 8)
        x, y, z, rgb = random_voxels(rng, dims, 300)  # deep columns
        w0 = build(dims, x, y, z, rgb)
        dw = dv.build_device_world([w0])
        mr = dw.max_runs
        assert mr > 8, mr
        # packing must have engaged (row narrower than the unpacked layout)
        assert dw.rec_fwd.shape[1] < ((dv.REC_META + mr + 7) // 8) * 8
        co = w0.col_offset.astype(np.int64)
        cr = w0.col_runs.astype(np.int64)
        wa = rm.world_arrays(dw)
        n_cols = dw.rec_fwd.shape[0]
        ci = jnp.arange(n_cols, dtype=jnp.int32).reshape(1, -1)
        valid = jnp.ones_like(ci, dtype=bool)
        for itd in (1, -1):
            n_runs, _, c_off, cmn, cmx, runs_k = rm._fetch_columns(
                wa, ci, valid, itd, mr)
            runs_k = np.asarray(runs_k)[0]
            # expected: the raw per-column runs (tail zero-padded), reversed
            # in place for itd < 0, each run keeping its fwd color index
            runs_src = np.concatenate([w0.runs, np.zeros(mr, np.int32)])
            rev = dv.reverse_runs(w0.runs, w0.col_offset, w0.col_runs)
            rev = np.concatenate([rev, np.zeros(mr, np.int32)])
            src = runs_src if itd > 0 else rev
            for c in range(n_cols):
                nr = int(cr[c])
                exp = np.zeros(mr, np.int32)
                exp[:nr] = src[int(co[c]):int(co[c]) + nr]
                assert np.array_equal(runs_k[c], exp), (itd, c)
