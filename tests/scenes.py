"""Shared tiny test scenes + oracle frame glue used by multiple test modules."""
import numpy as np

from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render import oracle
from cpuvox_tpu.render import segments as sg
from cpuvox_tpu.utils.colors import pack_argb
from cpuvox_tpu.world import rle

F = np.float32


def flat_floor_world(dims=(16, 16, 16), color=(40, 200, 60), y=0):
    X, Y, Z = dims
    xs, zs = np.meshgrid(np.arange(X), np.arange(Z), indexing="ij")
    xz = (xs * Z + zs).ravel()
    ys = np.full(xz.shape[0], y)
    r = np.full(xz.shape[0], color[0], np.uint8)
    g = np.full(xz.shape[0], color[1], np.uint8)
    b = np.full(xz.shape[0], color[2], np.uint8)
    return rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))


def tower_world(dims=(16, 16, 16), x=8, z=8, height=8, color=(200, 50, 50)):
    xz = np.full(height, x * dims[2] + z)
    ys = np.arange(height)
    r = np.full(height, color[0], np.uint8)
    g = np.full(height, color[1], np.uint8)
    b = np.full(height, color[2], np.uint8)
    return rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))


def gradient_tower_world(dims=(16, 16, 16), x=8, z=8, height=8):
    """Tower whose red channel encodes voxel y (for orientation/perspective tests)."""
    xz = np.full(height, x * dims[2] + z)
    ys = np.arange(height)
    r = (ys * 20).astype(np.uint8)
    g = np.zeros(height, np.uint8)
    b = np.full(height, 128, np.uint8)
    return rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))


def random_world(dims=(16, 16, 16), n=250, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, dims[0], n)
    y = rng.integers(0, dims[1], n)
    z = rng.integers(0, dims[2], n)
    rgb = tuple(rng.integers(0, 256, n).astype(np.uint8) for _ in range(3))
    return rle.build_lod_from_voxels(dims, 0, x * dims[2] + z, y, rgb)


def frame_setup(world, cam, lod_distances=None, lod_levels=6):
    """Common host-side per-frame setup; returns everything phase 1/2 need."""
    cam = cm.limit_rotation_horizon(cam)
    if lod_distances is None:
        far_clip = float(2 * max(world.dims))
        lod_distances = np.full(lod_levels, 4 * far_clip, F)  # LOD0-only by default
    elif isinstance(lod_distances, str) and lod_distances == "renderer":
        # the Renderer's own LOD policy (cm.setup_lods, lod_error 1.0)
        lod_distances, far_clip = cm.setup_lods(cam, max(world.dims),
                                                lod_levels, 1.0)
    else:
        lod_distances = np.asarray(lod_distances, F)
        far_clip = float(2 * max(world.dims))
    cam_data = cm.make_camera_data(cam, lod_distances, far_clip)
    vpw = cm.vanishing_point_world(cam)
    vps = cm.vanishing_point_screen(cam, vpw)
    segs = sg.build_segments(cam, vps)
    ctxs = sg.build_segment_contexts(cam, segs, vps)
    return cam, cam_data, vps, segs, ctxs


def render_oracle_frame(lods, cam, lod_distances=None):
    if isinstance(lods, rle.WorldLOD):
        lods = [lods] * 6
    cam, cam_data, vps, segs, ctxs = frame_setup(lods[0], cam, lod_distances)
    td, lr = oracle.render_raybuffers_oracle(lods, cam, cam_data, segs, ctxs)
    screen = oracle.reproject_oracle(cam, segs, ctxs, vps, td, lr)
    return screen, (td, lr, segs, ctxs, vps, cam_data, cam)


FLOOR_COLOR = pack_argb(40, 200, 60)
TOWER_COLOR = pack_argb(200, 50, 50)


def deep_tower_world(dims=(64, 64, 64), towers=40, pebbles=200, seed=11,
                     lod_levels=4):
    """Sparse deep-RLE towers + shallow pebbles: empty-majority LOD0 (the
    occupancy gate engages on auto) whose run histogram makes the adaptive
    lite-tier picker choose a tier (device._pick_lite_tier) — the mill-class
    content profile in miniature."""
    rng = np.random.default_rng(seed)
    xzs, ys = [], []
    for _ in range(towers):
        x = int(rng.integers(0, dims[0]))
        z = int(rng.integers(0, dims[2]))
        for _ in range(int(rng.integers(8, 13))):
            y0 = int(rng.integers(0, dims[1] - 8))
            for y in range(y0, min(y0 + 2, dims[1])):
                xzs.append(x * dims[2] + z)
                ys.append(y)
    for _ in range(pebbles):
        x = int(rng.integers(0, dims[0]))
        z = int(rng.integers(0, dims[2]))
        xzs.append(x * dims[2] + z)
        ys.append(int(rng.integers(0, 8)))
    xz = np.array(xzs, np.int64)
    y = np.array(ys, np.int64)
    rgb = tuple(((xz * 37 + y * (13 + i)) % 256).astype(np.uint8)
                for i in range(3))
    w0 = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
    return rle.build_lod_chain(w0, lod_levels)
