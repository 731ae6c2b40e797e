"""Dynamic on-device world rebuild tests (incl. voxel-exact LOD1 vs the
static builder — world/dynamic.py module docstring)."""
import numpy as np
import pytest

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.models.dynamic_demo import DynamicTerrain
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.utils.colors import DEBUG_MAGENTA, SKYBOX
from cpuvox_tpu.world import rle
from cpuvox_tpu.world.dynamic import (SurfaceWorldSpec,
                                      build_surface_world_arrays,
                                      surface_renderer,
                                      surface_world_max_runs, terrain_colors)


def test_surface_arrays_consistent():
    import jax.numpy as jnp

    spec = SurfaceWorldSpec(dims=(16, 32, 16), depth=4, lod_levels=3)
    top = jnp.full((16, 16), 10, jnp.int32)
    wa = build_surface_world_arrays(spec, top, terrain_colors(spec, top))
    rec = np.asarray(wa.col_rec)
    assert np.all(rec[:256, 0] == 3)  # LOD0: [air][band][air]
    runs = np.asarray(wa.runs)
    # LOD0 column 0: air above = 31-10=21, solid 4, air below = 7
    assert runs[0] == ((-1 << 16) | 21)
    assert runs[1] == 4
    assert runs[2] == ((-1 << 16) | 7)
    runs_rev = np.asarray(wa.runs_rev)
    assert runs_rev[0] == ((-1 << 16) | 7)
    assert runs_rev[2] == ((-1 << 16) | 21)
    assert rec[0, 2] == 1  # skybox shift
    # exact LOD1 (default): flat top=10/depth=4 band [7,10] halves to [3,5] —
    # one solid interval per 2x2 block, runs [air 10][solid 3][air 3]
    assert np.all(rec[256:320, 0] == 3)
    o1 = rec[256, 1]
    assert runs[o1] == ((-1 << 16) | 10)
    assert runs[o1 + 1] == 3  # colors_index 0, length 3
    assert runs[o1 + 2] == ((-1 << 16) | 3)
    # color table: LOD0 stride=depth, exact-LOD1 stride=cap1, LOD2 stride=depth
    cap1 = min(4 * (4 // 2 + 1), 16)
    assert np.asarray(wa.colors).shape[0] == \
        1 + 16 * 16 * 4 + 8 * 8 * cap1 + 4 * 4 * 4
    assert surface_world_max_runs(spec) == 9


def test_dynamic_terrain_renders_and_animates():
    dt = DynamicTerrain.create(dims=(32, 16, 32), depth=3,
                               config=RenderConfig(width=64, height=48,
                                                   chunk_steps=8,
                                                   max_march_chunks=24))
    cam = cm.Camera(position=(16, 12, 4), pitch_deg=25.0, yaw_deg=10.0)
    f0 = np.asarray(dt.render_frame(0.0, cam))
    f1 = np.asarray(dt.render_frame(1.5, cam))
    assert f0.shape == (48, 64)
    assert not np.any(f0 == DEBUG_MAGENTA)
    assert np.mean(f0 != SKYBOX) > 0.3  # terrain visible
    assert np.any(f0 != f1)  # the edit changed the image


# ------------------------------------------------- exact-LOD1 vs static builder

def _band_soup(dims, depth, top_np, colors_np):
    """Host expansion of a surface world to the voxel soup the static builder
    eats: per column, voxels y in [bl, tl] colored from the top-first slab."""
    X, Y, Z = dims
    tl = np.clip(top_np, 0, Y - 1)
    bl = np.maximum(tl - depth + 1, 0)
    xz, ys, cs = [], [], []
    for x in range(X):
        for z in range(Z):
            for y in range(int(bl[x, z]), int(tl[x, z]) + 1):
                xz.append(x * Z + z)
                ys.append(y)
                cs.append(colors_np[x, z, int(tl[x, z]) - y])
    c = np.asarray(cs, np.uint32)
    rgb = (((c >> 16) & 0xFF).astype(np.uint8),
           ((c >> 8) & 0xFF).astype(np.uint8),
           (c & 0xFF).astype(np.uint8))
    return np.asarray(xz, np.int64), np.asarray(ys, np.int64), rgb


def _dense_walk(n_cols, h, n_runs, run_off, color_off, runs, colors):
    """Walk packed RLE columns into dense (n_cols, h) occupancy + ARGB grids."""
    occ = np.zeros((n_cols, h), bool)
    col = np.zeros((n_cols, h), np.uint32)
    for ci in range(n_cols):
        y = h - 1
        for r in runs[run_off[ci]:run_off[ci] + n_runs[ci]]:
            r = int(r)
            ln = r & 0xFFFF
            if r < 0:
                y -= ln
            else:
                cidx = r >> 16
                for k in range(ln):
                    occ[ci, y] = True
                    col[ci, y] = colors[color_off[ci] + cidx + k]
                    y -= 1
    return occ, col


def _dense_from_worldlod(w):
    gx, gz = w.dims[0] >> w.lod, w.dims[2] >> w.lod
    h = w.dims[1] >> w.lod
    return _dense_walk(gx * gz, h, np.asarray(w.col_runs),
                       np.asarray(w.col_offset),
                       np.asarray(w.col_color_offset),
                       np.asarray(w.runs), np.asarray(w.colors))


def _dense_from_surface_level(wa, dims, level):
    gx, gz = dims[0] >> level, dims[2] >> level
    h = dims[1] >> level
    rec = np.asarray(wa.col_rec)
    base = int(np.asarray(wa.col_base)[level])
    rec = rec[base:base + gx * gz]
    return _dense_walk(gx * gz, h, rec[:, 0], rec[:, 1], rec[:, 2],
                       np.asarray(wa.runs), np.asarray(wa.colors))


def _random_surface(dims, depth, seed, multi_interval=False):
    X, Y, Z = dims
    rng = np.random.default_rng(seed)
    # tops beyond Y-1 exercise the builder's clamp; near-0 tops the floor clamp
    top = rng.integers(0, Y + 3, size=(X, Z)).astype(np.int32)
    if multi_interval:
        # force disjoint bands inside 2x2 blocks (neither touching the top of
        # the column nor the floor) -> >3-run LOD1 columns
        top[0::2, :] = Y - 2
        top[1::2, :] = depth + 4
    colors = (np.uint32(0xFF) << 24 \
              | rng.integers(0, 1 << 24, size=(X, Z, depth)).astype(np.uint32))
    return top, colors


@pytest.mark.parametrize("multi", [False, True])
def test_exact_lod1_matches_static_downsample(multi):
    import jax.numpy as jnp

    dims, depth = (16, 32, 16), 5
    spec = SurfaceWorldSpec(dims=dims, depth=depth, lod_levels=2)
    top, colors = _random_surface(dims, depth, seed=3 + multi,
                                  multi_interval=multi)
    wa = build_surface_world_arrays(spec, jnp.asarray(top),
                                    jnp.asarray(colors))

    xz, ys, rgb = _band_soup(dims, depth, top, colors)
    lod0 = rle.build_lod_from_voxels(dims, 0, xz, ys, rgb)
    static_lod1 = rle.downsample(lod0, 1)

    occ_s, col_s = _dense_from_worldlod(static_lod1)
    occ_d, col_d = _dense_from_surface_level(wa, dims, 1)
    np.testing.assert_array_equal(occ_s, occ_d)
    np.testing.assert_array_equal(col_s[occ_s], col_d[occ_d])
    if multi:  # the crafted layout must actually exercise >3-run columns
        rec = np.asarray(wa.col_rec)
        base = int(np.asarray(wa.col_base)[1])
        assert rec[base:base + 8 * 8, 0].max() > 3


def test_exact_lod1_render_matches_static_world():
    """End-to-end: a dynamic surface world and the static builder's chain
    render PIXEL-IDENTICAL frames with LOD1 engaged over most of the view."""
    import jax.numpy as jnp

    dims, depth = (32, 32, 32), 4
    spec = SurfaceWorldSpec(dims=dims, depth=depth, lod_levels=2)
    top, colors = _random_surface(dims, depth, seed=9)
    # smooth the random tops a little so the scene has coherent geometry
    top = np.minimum(top, np.roll(top, 1, 0) + 6).astype(np.int32)

    xz, ys, rgb = _band_soup(dims, depth, top, colors)
    lod0 = rle.build_lod_from_voxels(dims, 0, xz, ys, rgb)
    lods = [lod0, rle.downsample(lod0, 1)]

    cfg = RenderConfig(width=64, height=48, lod_levels=2, chunk_steps=8,
                       max_march_chunks=32)
    lod_distances = np.array([6.0, 1e6], np.float32)
    far_clip = float(3 * max(dims))

    r_static = Renderer.create(lods, cfg)
    r_static.lod_distances, r_static.far_clip = lod_distances, far_clip
    r_dyn = surface_renderer(spec, jnp.asarray(top), jnp.asarray(colors), cfg)
    r_dyn.lod_distances, r_dyn.far_clip = lod_distances.copy(), far_clip

    for cam in (cm.Camera(position=(16, 20, 4), pitch_deg=25.0, yaw_deg=10.0),
                cm.Camera(position=(16, 6, 16), pitch_deg=-30.0,
                          yaw_deg=200.0)):
        f_s = np.asarray(r_static.render(cam))
        f_d = np.asarray(r_dyn.render(cam))
        assert not np.any(f_s == DEBUG_MAGENTA)
        np.testing.assert_array_equal(f_s, f_d)
