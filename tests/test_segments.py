"""Segment setup tests — geometric invariants of the 4-way VP screen split."""
import numpy as np
import pytest

from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render import segments as sg

F = np.float32


def setup(pitch, yaw=0.0, screen=(320, 200), pos=(50.0, 30.0, 50.0)):
    cam = cm.limit_rotation_horizon(cm.Camera(
        position=pos, pitch_deg=pitch, yaw_deg=yaw, screen=screen))
    vpw = cm.vanishing_point_world(cam)
    vps = cm.vanishing_point_screen(cam, vpw)
    segs = sg.build_segments(cam, vps)
    return cam, vps, segs


class TestBuildSegments:
    def test_vp_on_screen_all_four_active(self):
        # pitch 50 with fov 85 puts the nadir VP inside the screen
        cam, vps, segs = setup(pitch=50.0)
        assert 0 < vps[0] < 320 and 0 < vps[1] < 200
        assert all(s.ray_count > 0 for s in segs)
        # with the VP on screen the 45-degree fans are unclamped:
        # seg0+seg1 x-extents = 2*(h-vp.y) + 2*vp.y = 2h, and likewise 2w for seg2+seg3
        assert segs[0].ray_count + segs[1].ray_count == pytest.approx(2 * 200, abs=3)
        assert segs[2].ray_count + segs[3].ray_count == pytest.approx(2 * 320, abs=3)

    def test_gentle_pitch_only_one_vertical_segment(self):
        # looking nearly level and slightly down: VP far below screen -> only the
        # "top" segment (segment 0) is active vertically
        cam, vps, segs = setup(pitch=2.0)
        assert vps[1] < 0
        assert segs[0].ray_count > 0
        assert segs[1].ray_count == 0
        # left/right segments: vp.x is on-screen horizontally (yaw 0) but the
        # 45-degree cones from a VP far below screen do not reach it
        assert segs[2].ray_count == 0 and segs[3].ray_count == 0

    def test_looking_up_mirror(self):
        cam, vps, segs = setup(pitch=-2.0)
        assert vps[1] > 200
        assert segs[1].ray_count > 0 and segs[0].ray_count == 0

    def test_segment_bounds_ordered(self):
        for pitch in (50.0, 30.0, -40.0, 80.0):
            cam, vps, segs = setup(pitch=pitch)
            for i, s in enumerate(segs):
                if s.ray_count == 0:
                    continue
                sec = 1 if i > 1 else 0
                assert s.min_screen[sec] <= s.max_screen[sec]

    def test_ray_count_matches_screen_extent(self):
        cam, vps, segs = setup(pitch=30.0)
        for i, s in enumerate(segs):
            if s.ray_count == 0:
                continue
            sec = 1 if i > 1 else 0
            assert s.ray_count == int(np.round(s.max_screen[sec] - s.min_screen[sec]))

    def test_off_screen_vp_clamps_to_corners(self):
        # VP below the screen: segment 0's triangle should be clamped so its corners
        # stay within (or near) the horizontal screen extent
        cam, vps, segs = setup(pitch=15.0)
        s = segs[0]
        assert s.ray_count > 0
        assert s.min_screen[0] >= -325  # 45-degree fallback bound
        assert s.ray_count <= 2 * 320 + 200  # fits the reference's buffer sizing


class TestContexts:
    def test_pixel_ranges_partition_screen(self):
        cam, vps, segs = setup(pitch=50.0)
        ctxs = sg.build_segment_contexts(cam, segs, vps)
        # top segment writes pixels vp.y..h-1, bottom 0..vp.y
        assert ctxs[0].next_free_pixel_max == 199
        assert ctxs[1].next_free_pixel_min == 0
        assert ctxs[0].next_free_pixel_min == ctxs[1].next_free_pixel_max
        assert ctxs[2].next_free_pixel_max == 319
        assert ctxs[3].next_free_pixel_min == 0
        assert ctxs[0].seen_pixel_cache_length == 200
        assert ctxs[2].seen_pixel_cache_length == 320
        assert ctxs[1].ray_index_offset == segs[0].ray_count
        assert ctxs[3].ray_index_offset == segs[2].ray_count


class TestRayDirections:
    def test_normalized_and_fan_ordered(self):
        cam, vps, segs = setup(pitch=50.0)
        for s in segs:
            d = sg.ray_directions(s)
            if d.shape[0] == 0:
                continue
            np.testing.assert_allclose(np.sum(d * d, axis=1), 1.0, atol=1e-5)
            # directions sweep monotonically in angle
            ang = np.unwrap(np.arctan2(d[:, 1], d[:, 0]))
            dd = np.diff(ang)
            assert np.all(dd > 0) or np.all(dd < 0)

    def test_first_ray_matches_min_plane(self):
        cam, vps, segs = setup(pitch=50.0)
        s = segs[0]
        d = sg.ray_directions(s)
        expect = s.cam_local_plane_ray_min / np.linalg.norm(s.cam_local_plane_ray_min)
        np.testing.assert_allclose(d[0], expect, atol=1e-6)
