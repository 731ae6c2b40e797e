"""Oracle renderer tests on scenes with geometrically known expected output."""
import numpy as np
import pytest

import scenes
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.utils.colors import DEBUG_MAGENTA, SKYBOX, pack_argb, unpack_argb

F = np.float32
SCREEN = (64, 48)


def cam_at(pos, pitch, yaw=0.0, screen=SCREEN):
    return cm.Camera(position=pos, pitch_deg=pitch, yaw_deg=yaw, screen=screen)


class TestEmptyWorld:
    def test_all_skybox(self):
        w = scenes.random_world(n=0)
        screen, _ = scenes.render_oracle_frame(w, cam_at((8, 8, 8), 10.0))
        assert np.all(screen == SKYBOX)


class TestFloor:
    def test_looking_down_sees_floor_everywhere(self):
        w = scenes.flat_floor_world()
        screen, _ = scenes.render_oracle_frame(w, cam_at((8, 6, 8), 85.0))
        frac_floor = np.mean(screen == scenes.FLOOR_COLOR)
        assert frac_floor > 0.99

    def test_looking_up_sees_sky(self):
        w = scenes.flat_floor_world()
        screen, _ = scenes.render_oracle_frame(w, cam_at((8, 6, 8), -60.0))
        assert np.mean(screen == SKYBOX) > 0.95

    def test_horizon_split(self):
        # gentle downward look from above the floor: floor fills the lower part of
        # the screen, sky the upper part
        w = scenes.flat_floor_world()
        screen, _ = scenes.render_oracle_frame(w, cam_at((8, 3, 8), 8.0))
        bottom = screen[:10]  # rows are y-up: row 0 = screen bottom
        top = screen[-10:]
        assert np.mean(bottom == scenes.FLOOR_COLOR) > 0.9
        assert np.mean(top == SKYBOX) > 0.9

    def test_every_pixel_written(self):
        w = scenes.flat_floor_world()
        for pitch in (85.0, 30.0, 8.0, -8.0, -45.0):
            screen, _ = scenes.render_oracle_frame(w, cam_at((8, 5, 8), pitch, yaw=33.0))
            assert not np.any(screen == DEBUG_MAGENTA), pitch


class TestTower:
    def test_tower_visible_in_center(self):
        w = scenes.tower_world(x=8, z=12, height=10)
        # camera south of tower looking north (+z), slightly down
        screen, _ = scenes.render_oracle_frame(w, cam_at((8.5, 5, 2), 5.0, yaw=0.0))
        cols = np.nonzero(np.any(screen == scenes.TOWER_COLOR, axis=0))[0]
        assert cols.size > 0
        # tower is straight ahead -> its pixels center around screen mid-x
        assert abs(cols.mean() - 32) < 4

    def test_tower_yaw_moves_it(self):
        w = scenes.tower_world(x=8, z=12, height=10)
        screen_l, _ = scenes.render_oracle_frame(w, cam_at((8.5, 5, 2), 5.0, yaw=-15.0))
        screen_r, _ = scenes.render_oracle_frame(w, cam_at((8.5, 5, 2), 5.0, yaw=15.0))
        cols_l = np.nonzero(np.any(screen_l == scenes.TOWER_COLOR, axis=0))[0]
        cols_r = np.nonzero(np.any(screen_r == scenes.TOWER_COLOR, axis=0))[0]
        # yawing right moves the tower left on screen
        assert cols_l.mean() > 36
        assert cols_r.mean() < 28
        assert cols_l.mean() > cols_r.mean() + 8

    def test_gradient_tower_orientation(self):
        # red channel encodes voxel y; higher screen rows must sample higher voxels
        w = scenes.gradient_tower_world(x=8, z=12, height=8)
        screen, _ = scenes.render_oracle_frame(w, cam_at((8.5, 4, 4), 2.0))
        ys, xs = np.nonzero((screen != SKYBOX) & (screen != DEBUG_MAGENTA))
        assert ys.size > 4
        mid = xs[np.argmin(np.abs(xs - 32))]
        col_rows = ys[xs == mid]
        reds = [unpack_argb(screen[r, mid])[0] for r in col_rows]
        rows_sorted = np.sort(col_rows)
        reds_sorted = [unpack_argb(screen[r, mid])[0] for r in rows_sorted]
        assert all(np.diff([int(r) for r in reds_sorted]) >= 0)

    def test_occlusion_front_hides_back(self):
        # two towers in line with the camera: only the front one is visible
        import cpuvox_tpu.world.rle as rle
        dims = (16, 16, 16)
        front = scenes.tower_world(dims, x=8, z=6, height=12, color=(200, 50, 50))
        xz = np.concatenate([
            np.full(12, 8 * 16 + 6), np.full(12, 8 * 16 + 12)])
        ys = np.concatenate([np.arange(12), np.arange(12)])
        r = np.concatenate([np.full(12, 200), np.full(12, 9)]).astype(np.uint8)
        g = np.full(24, 50, np.uint8)
        b = np.full(24, 50, np.uint8)
        w = rle.build_lod_from_voxels(dims, 0, xz, ys, (r, g, b))
        screen, _ = scenes.render_oracle_frame(w, cam_at((8.5, 5, 2), 3.0))
        assert np.any(screen == pack_argb(200, 50, 50))
        assert not np.any(screen == pack_argb(9, 50, 50))


class TestRayBuffers:
    def test_raybuffer_rows_fully_written_in_pixel_range(self):
        w = scenes.flat_floor_world()
        _, (td, lr, segs, ctxs, vps, cam_data, cam) = scenes.render_oracle_frame(
            w, cam_at((8, 5, 8), 45.0))
        for si, (seg, ctx) in enumerate(zip(segs, ctxs)):
            buf = td if si < 2 else lr
            for i in range(seg.ray_count):
                row = buf[ctx.ray_index_offset + i]
                window = row[ctx.next_free_pixel_min: ctx.next_free_pixel_max + 1]
                assert not np.any(window == DEBUG_MAGENTA), (si, i)


class TestLodSwitch:
    def test_far_floor_uses_lods_consistently(self):
        # floor world with a LOD chain; force small LOD distances so distant cells use
        # coarser LODs; the floor must still cover the lower screen with its color
        import cpuvox_tpu.world.rle as rle
        w0 = scenes.flat_floor_world(dims=(64, 16, 64))
        lods = rle.build_lod_chain(w0, 6)
        lod_distances = np.array([8, 16, 32, 64, 128, 512], F)
        screen, _ = scenes.render_oracle_frame(
            lods, cam_at((32, 4, 32), 12.0), lod_distances=lod_distances)
        bottom = screen[:8]
        assert np.mean(bottom == scenes.FLOOR_COLOR) > 0.9
        assert not np.any(screen == DEBUG_MAGENTA)
