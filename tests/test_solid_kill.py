"""Solid-bound ray kill (RenderConfig.solid_kill): output invariance.

The kill retires a ray once its frozen frustum window provably clears the
world's solid Y bounds (raymarch._rasterize_step / phase1_kernel; no reference
analog — strictly stronger than DrawSegmentRayJob.cs:261-281's world-box
retire).  These tests render scenes BUILT to trigger it (low content in a tall
world box, cameras whose sky tails otherwise march to far clip) and assert the
frame is bit-identical with the kill on and off, on both backends and both
iteration directions, plus the gated path (whose pre-kill also drops cells
from the fetch gate).
"""
import dataclasses

import numpy as np
import pytest

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world import rle

F = np.float32


def low_terrain_tall_box(dims=(64, 64, 64), seed=3):
    """Bumpy floor occupying only y in [0, 12) of a 64-high box — solid_max_y
    far below world_max_y, so sky windows clear it quickly."""
    rng = np.random.default_rng(seed)
    X, Y, Z = dims
    h = (4 + 8 * rng.random((X, Z))).astype(np.int64)  # heights in [4, 12)
    xs, zs = np.meshgrid(np.arange(X), np.arange(Z), indexing="ij")
    xz, ys = [], []
    for d in range(3):  # 3-deep shell
        keep = h - d >= 0
        xz.append((xs * Z + zs)[keep].ravel())
        ys.append((h - d)[keep].ravel())
    xz = np.concatenate(xz)
    ys = np.concatenate(ys)
    r = (ys * 9).astype(np.uint8)
    g = np.full(xz.shape[0], 160, np.uint8)
    b = (xz % 251).astype(np.uint8)
    lod0 = rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))
    return rle.build_lod_chain(lod0, 3)


def sparse_towers_tall_box(dims=(64, 64, 64)):
    """Mostly-empty world (occupancy gate engages) with towers topping at 20."""
    X, Y, Z = dims
    xz, ys = [], []
    for tx, tz, th in ((8, 8, 20), (40, 12, 14), (20, 44, 17), (52, 52, 9)):
        for d in range(th):
            xz.append(tx * Z + tz)
            ys.append(d)
    xz = np.asarray(xz)
    ys = np.asarray(ys)
    r = (ys * 11 % 256).astype(np.uint8)
    g = np.full(xz.shape[0], 90, np.uint8)
    b = np.full(xz.shape[0], 200, np.uint8)
    lod0 = rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))
    return rle.build_lod_chain(lod0, 3)


CAMS = [
    # above the content looking near-horizon: the post-write sky tail
    cm.Camera(position=(20.0, 30.0, 20.0), pitch_deg=-5.0, yaw_deg=30.0),
    # below-horizon view with sky above (kill fires after terrain writes)
    cm.Camera(position=(32.0, 25.0, 8.0), pitch_deg=-20.0, yaw_deg=10.0),
    # looking up (inverse iteration direction)
    cm.Camera(position=(12.0, 18.0, 40.0), pitch_deg=-35.0, yaw_deg=200.0),
]


def _render_pair(lods, cam, backend, **cfg_kw):
    base = RenderConfig(width=96, height=64, backend=backend,
                        pallas_interpret=True, **cfg_kw)
    r_on = Renderer.create(lods, base)
    assert r_on.solid_bounds[1] is not None
    r_off = dataclasses.replace(
        r_on, config=dataclasses.replace(base, solid_kill="off"))
    a = r_on.render(cam)
    b = r_off.render(cam)
    return a, b


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("ci", range(len(CAMS)))
def test_kill_invariant_dense(backend, ci):
    lods = low_terrain_tall_box()
    a, b = _render_pair(lods, CAMS[ci], backend)
    assert (a == b).all(), f"{(a != b).sum()} px differ (dense, {backend})"


@pytest.mark.parametrize("ci", range(len(CAMS)))
def test_kill_invariant_gated(ci):
    lods = sparse_towers_tall_box()
    a, b = _render_pair(lods, CAMS[ci], "pallas", occupancy_gate="on")
    assert (a == b).all(), f"{(a != b).sum()} px differ (gated)"


def test_kill_fires():
    """The kill must actually shorten the march on a triggering scene (guards
    against the condition silently never firing)."""
    import jax.numpy as jnp

    from cpuvox_tpu.render import raymarch as rm

    # big grid: nothing exits the world inside the capped march, so the only
    # way a sky ray leaves rs.alive in the ON leg is the kill itself
    lods = low_terrain_tall_box(dims=(128, 64, 128))
    cfg = RenderConfig(width=96, height=64, backend="xla")
    r = Renderer.create(lods, cfg)
    # camera above the content with the WHOLE screen above the horizon
    # (positive pitch looks DOWN in the Unity convention): every ray's first
    # re-clip yields fdir_min > 0 and a window bottom (30+) already past
    # solid_max_y (~13), so the kill fires at the next processed cell
    cam, cam_data = r.setup_camera(
        cm.Camera(position=(20.0, 30.0, 20.0), pitch_deg=-50.0, yaw_deg=30.0))
    from cpuvox_tpu.render import segments as sg
    vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
    segs = sg.build_segments(cam, vps)
    ctxs = sg.build_segment_contexts(cam, segs, vps)
    static, dda, alive0, _ = rm.init_rays(cam_data, segs, ctxs,
                                          r.device_world.dims,
                                          fixed_size=r.ray_capacity)
    counts = {}
    for tag, bounds in (("on", r.solid_bounds), ("off", (None, None))):
        rs = rm.RasterState(
            raybuf=jnp.full((r.ray_capacity, 96), -1, jnp.int32),
            nfp_min=static.orig_min, nfp_max=static.orig_max,
            fb_min=static.orig_min.astype(jnp.float32) - 0.501,
            fb_max=static.orig_max.astype(jnp.float32) + 0.501,
            f_active=jnp.zeros(r.ray_capacity, bool),
            fdir_min=jnp.zeros(r.ray_capacity, jnp.float32),
            fdir_max=jnp.zeros(r.ray_capacity, jnp.float32),
            alive=jnp.ones(r.ray_capacity, bool))
        out = rm.march(r._wa, static, dda, alive0, rs,
                       cam_data.lod_distances, cam_data.far_clip,
                       r.device_world.dims, float(r.device_world.dims[1]),
                       cam_data.position[1],
                       1 if not cam_data.inverse_element_iteration_direction
                       else -1,
                       # cap the march low enough that the no-kill leg still
                       # has live sky rays at the cap while the kill leg has
                       # retired them (full marches end with 0 alive both ways)
                       chunk=8, max_chunks=10,
                       max_runs=r.device_world.max_runs,
                       solid_min_y=bounds[0], solid_max_y=bounds[1])
        counts[tag] = int(np.asarray(out.alive).sum())
    assert counts["on"] < counts["off"], counts
