"""General on-device editable world (world/dynamic.py EditableWorld):
set_voxel_column must render exactly like a statically rebuilt world."""
import dataclasses

import jax.numpy as jnp
import numpy as np

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world import rle
from cpuvox_tpu.world.dynamic import (EditableWorldSpec, editable_from_lod0,
                                      editable_world_arrays, set_voxel_column)

DIMS = (16, 16, 16)


def _lod0_renderer(w, backend="xla"):
    cfg = RenderConfig(width=64, height=48, backend=backend, chunk_steps=8,
                       max_march_chunks=32, lod_levels=1)
    r = Renderer.create([w], cfg)
    far = float(2 * max(DIMS))
    r.lod_distances = np.full(1, 4 * far, np.float32)
    r.far_clip = far
    return r


def _editable_renderer(w, spec, ew, backend="xla"):
    from cpuvox_tpu.world.dynamic import editable_renderer
    cfg = RenderConfig(width=64, height=48, backend=backend, chunk_steps=8,
                       max_march_chunks=32, lod_levels=1)
    return editable_renderer(spec, ew, cfg)


def test_editable_matches_static():
    w = scenes.random_world(dims=DIMS, n=250, seed=3)
    spec, ew = editable_from_lod0(w)
    cam = cm.Camera(position=(8, 10, 8), pitch_deg=30.0, yaw_deg=50.0,
                    screen=(64, 48))
    s_static = _lod0_renderer(w).render(cam)
    s_edit = _editable_renderer(w, spec, ew).render(cam)
    np.testing.assert_array_equal(s_edit, s_static)


def test_set_voxel_column_matches_rebuilt_world():
    w = scenes.flat_floor_world(dims=DIMS)
    spec, ew = editable_from_lod0(w, max_runs=6, col_colors=8)
    cam = cm.Camera(position=(8, 6, 2), pitch_deg=20.0, yaw_deg=0.0,
                    screen=(64, 48))

    # edit: build a 5-voxel tower with a gap at (8, 8)
    occ = np.zeros(DIMS[1], bool)
    occ[0] = True          # keep the floor voxel
    occ[3:6] = True        # floating block
    occ[8] = True          # lone voxel above a gap
    argb = np.zeros(DIMS[1], np.uint32)
    argb[occ] = np.asarray(
        [0xFF11AA33, 0xFFCC2222, 0xFFCC3322, 0xFFCC4422, 0xFF2233EE],
        np.uint32)
    ew2 = set_voxel_column(spec, ew, jnp.int32(8), jnp.int32(8),
                           jnp.asarray(occ), jnp.asarray(argb))

    # statically rebuilt equivalent
    ys_all, xz_all, cols_all = [], [], []
    from cpuvox_tpu.world.dynamic import _expand_lod0
    cols0, ys0, argb0 = _expand_lod0(w)
    keep = cols0 != (8 * DIMS[2] + 8)
    xz_all.append(cols0[keep])
    ys_all.append(ys0[keep])
    cols_all.append(argb0[keep])
    ys_new = np.nonzero(occ)[0]
    xz_all.append(np.full(ys_new.shape[0], 8 * DIMS[2] + 8))
    ys_all.append(ys_new)
    cols_all.append(argb[occ])
    xz = np.concatenate(xz_all)
    ys = np.concatenate(ys_all)
    cc = np.concatenate(cols_all)
    r_, g_, b_ = ((cc >> 16) & 0xFF).astype(np.uint8), \
        ((cc >> 8) & 0xFF).astype(np.uint8), (cc & 0xFF).astype(np.uint8)
    w2 = rle.build_lod_from_voxels(DIMS, 0, xz, ys, (r_, g_, b_))

    s_rebuilt = _lod0_renderer(w2).render(cam)
    s_edited = _editable_renderer(w, spec, ew2).render(cam)
    np.testing.assert_array_equal(s_edited, s_rebuilt)
    # and the edit actually changed pixels vs the original
    s_orig = _editable_renderer(w, spec, ew).render(cam)
    assert np.any(s_edited != s_orig)


# ------------------------- deferred exact LOD chain rebuild (editable worlds)

def test_editable_chain_matches_static_chain():
    """editable_chain_snapshot must be dense-identical to rle.build_lod_chain
    at EVERY level (occupancy AND flat-averaged colors)."""
    from test_dynamic import _dense_from_surface_level, _dense_from_worldlod

    from cpuvox_tpu.world.dynamic import editable_chain_snapshot

    w = scenes.random_world(dims=DIMS, n=250, seed=3)
    chain = rle.build_lod_chain(w, lod_levels=3)
    spec, ew = editable_from_lod0(w)
    wa, K = editable_chain_snapshot(spec, ew, lod_levels=3)
    for lvl in range(3):
        occ_s, col_s = _dense_from_worldlod(chain[lvl])
        occ_d, col_d = _dense_from_surface_level(wa, DIMS, lvl)
        np.testing.assert_array_equal(occ_s, occ_d, err_msg=f"lvl {lvl}")
        np.testing.assert_array_equal(col_s[occ_s], col_d[occ_d],
                                      err_msg=f"lvl {lvl}")


def test_editable_chain_render_matches_static():
    """End-to-end: the chain snapshot renders pixel-identical to the static
    builder's chain with LOD1/LOD2 engaged over most of the view."""
    from cpuvox_tpu.world.dynamic import editable_chain_renderer

    w = scenes.random_world(dims=DIMS, n=250, seed=7)
    chain = rle.build_lod_chain(w, lod_levels=3)
    spec, ew = editable_from_lod0(w)

    cfg = RenderConfig(width=64, height=48, chunk_steps=8,
                       max_march_chunks=32, lod_levels=3)
    lod_distances = np.array([3.0, 6.0, 1e6], np.float32)
    far = float(3 * max(DIMS))

    r_static = Renderer.create(chain, cfg)
    r_static.lod_distances, r_static.far_clip = lod_distances, far
    r_chain = editable_chain_renderer(spec, ew, cfg, lod_levels=3)
    r_chain.lod_distances, r_chain.far_clip = lod_distances.copy(), far

    for cam in (cm.Camera(position=(8, 10, 2), pitch_deg=25.0, yaw_deg=30.0),
                cm.Camera(position=(8, 4, 8), pitch_deg=-20.0,
                          yaw_deg=190.0)):
        np.testing.assert_array_equal(
            np.asarray(r_static.render(cam)), np.asarray(r_chain.render(cam)))


def test_edit_then_chain_rebuild_matches_static_downsample():
    """set_voxel_column followed by a chain rebuild equals the static chain of
    the edited content (the deferred-rebuild model's correctness contract)."""
    from test_dynamic import _dense_from_surface_level, _dense_from_worldlod

    from cpuvox_tpu.world.dynamic import (_expand_lod0,
                                          editable_chain_snapshot)

    w = scenes.flat_floor_world(dims=DIMS)
    spec, ew = editable_from_lod0(w, max_runs=6, col_colors=8)
    occ = np.zeros(DIMS[1], bool)
    occ[[0, 3, 4, 5, 8]] = True
    argb = np.zeros(DIMS[1], np.uint32)
    argb[occ] = np.asarray(
        [0xFF11AA33, 0xFFCC2222, 0xFFCC3322, 0xFFCC4422, 0xFF2233EE],
        np.uint32)
    ew2 = set_voxel_column(spec, ew, jnp.int32(8), jnp.int32(8),
                           jnp.asarray(occ), jnp.asarray(argb))
    wa, _ = editable_chain_snapshot(spec, ew2, lod_levels=2)

    cols0, ys0, argb0 = _expand_lod0(w)
    keep = cols0 != (8 * DIMS[2] + 8)
    ys_new = np.nonzero(occ)[0]
    xz = np.concatenate([cols0[keep], np.full(ys_new.size, 8 * DIMS[2] + 8)])
    ys = np.concatenate([ys0[keep], ys_new])
    cc = np.concatenate([argb0[keep], argb[occ]])
    rgb = (((cc >> 16) & 0xFF).astype(np.uint8),
           ((cc >> 8) & 0xFF).astype(np.uint8), (cc & 0xFF).astype(np.uint8))
    w2 = rle.build_lod_from_voxels(DIMS, 0, xz, ys, rgb)
    static_lod1 = rle.downsample(w2, 1)

    occ_s, col_s = _dense_from_worldlod(static_lod1)
    occ_d, col_d = _dense_from_surface_level(wa, DIMS, 1)
    np.testing.assert_array_equal(occ_s, occ_d)
    np.testing.assert_array_equal(col_s[occ_s], col_d[occ_d])
