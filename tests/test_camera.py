"""Camera math tests — geometric invariants of the Unity-convention matrices."""
import numpy as np
import pytest

from cpuvox_tpu.render import camera as cm

F = np.float32


def make_cam(**kw):
    defaults = dict(position=(10.0, 5.0, 20.0), pitch_deg=10.0, yaw_deg=30.0,
                    fov_y_deg=85.0, near=0.05, far=1000.0, screen=(640, 360))
    defaults.update(kw)
    return cm.Camera(**defaults)


def project_pixel(cam, world_point):
    m = cm.world_to_screen_matrix(cam)
    p = m @ np.array([*world_point, 1.0], dtype=F)
    return p[:2] / p[3]


class TestRotation:
    def test_identity(self):
        r = cm.rotation_matrix(0, 0, 0)
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_pitch_down(self):
        # Unity: euler x = +90 looks straight down
        cam = make_cam(pitch_deg=90.0, yaw_deg=0.0)
        np.testing.assert_allclose(cm.camera_forward(cam), [0, -1, 0], atol=1e-6)

    def test_yaw_right(self):
        cam = make_cam(pitch_deg=0.0, yaw_deg=90.0)
        np.testing.assert_allclose(cm.camera_forward(cam), [1, 0, 0], atol=1e-6)

    def test_orthonormal(self):
        r = cm.rotation_matrix(33.0, -117.0, 45.0)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


class TestProjection:
    def test_forward_point_projects_to_center(self):
        cam = make_cam(pitch_deg=17.0, yaw_deg=123.0)
        target = np.asarray(cam.position, F) + cm.camera_forward(cam) * 50.0
        px = project_pixel(cam, target)
        np.testing.assert_allclose(px, [320, 180], atol=0.01)

    def test_point_right_of_forward_projects_right_of_center(self):
        cam = make_cam(pitch_deg=0.0, yaw_deg=0.0, position=(0, 0, 0))
        px = project_pixel(cam, (5.0, 0.0, 50.0))
        assert px[0] > 320
        assert px[1] == pytest.approx(180, abs=0.01)

    def test_point_above_projects_up_in_pixels(self):
        cam = make_cam(pitch_deg=0.0, yaw_deg=0.0, position=(0, 0, 0))
        px = project_pixel(cam, (0.0, 5.0, 50.0))
        # pixel y axis points up in the reference's pixel space (no flip anywhere)
        assert px[1] > 180

    def test_behind_camera_has_nonpositive_near_coord(self):
        # z+w <= 0 is the "behind near plane" test used by the kernels
        cam = make_cam(pitch_deg=0.0, yaw_deg=0.0, position=(0, 0, 0))
        m = cm.world_to_screen_matrix(cam)
        p = m @ np.array([0, 0, -10, 1], dtype=F)
        assert p[2] + p[3] <= 0  # the matrix bakes Translate z+1 making z' = z_clip + w
        p2 = m @ np.array([0, 0, 10, 1], dtype=F)
        assert p2[2] > 0

    def test_near_plane_boundary(self):
        cam = make_cam(pitch_deg=0.0, yaw_deg=0.0, position=(0, 0, 0), near=0.5)
        m = cm.world_to_screen_matrix(cam)
        # a point exactly on the near plane: z' == 0
        p = m @ np.array([0, 0, 0.5, 1], dtype=F)
        assert p[2] == pytest.approx(0.0, abs=1e-4)


class TestVanishingPoint:
    def test_looking_down_vp_is_below(self):
        # pitch > 0 (looking down): vp = nadir direction; at pitch 45 with fov 85
        # (half-fov 42.5) it sits just below the bottom screen edge (pixel y up).
        cam = make_cam(pitch_deg=45.0, yaw_deg=0.0, position=(0, 10, 0))
        vpw = cm.vanishing_point_world(cam)
        assert vpw[1] < 10.0
        vps = cm.vanishing_point_screen(cam, vpw)
        assert -60 < vps[1] < 0

    def test_looking_up_vp_is_above(self):
        cam = make_cam(pitch_deg=-45.0, yaw_deg=0.0, position=(0, 10, 0))
        vpw = cm.vanishing_point_world(cam)
        assert vpw[1] > 10.0
        vps = cm.vanishing_point_screen(cam, vpw)
        assert 360 < vps[1] < 420

    def test_vp_screen_x_centered_for_no_roll(self):
        cam = make_cam(pitch_deg=30.0, yaw_deg=77.0, roll_deg=0.0)
        vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
        assert vps[0] == pytest.approx(320, abs=0.1)

    def test_gentle_pitch_vp_far_off_screen(self):
        cam = make_cam(pitch_deg=1.0)
        vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
        assert abs(vps[1]) > 5000


class TestTransformPixel:
    def test_roundtrip_center(self):
        cam = make_cam(pitch_deg=20.0, yaw_deg=40.0, position=(0, 0, 0))
        xz = cm.transform_pixel_to_local_xz(cam, np.array([320, 180], dtype=F))
        fwd = cm.camera_forward(cam)
        # center pixel local-xz dir should be parallel to forward.xz
        c = xz[0] * fwd[2] - xz[1] * fwd[0]
        assert abs(c) < 1e-3

    def test_screen_point_to_ray_center_is_forward(self):
        cam = make_cam(pitch_deg=20.0, yaw_deg=40.0)
        d = cm.screen_point_to_ray(cam, np.array([320, 180], dtype=F))
        np.testing.assert_allclose(d, cm.camera_forward(cam), atol=1e-4)


class TestLods:
    def test_monotonic_and_bounded(self):
        cam = make_cam(screen=(1280, 720))
        dists, far = cm.setup_lods(cam, 1024, lod_levels=6, lod_error=1.0)
        assert far == 2048.0
        assert dists.shape == (6,)
        assert np.all(np.diff(dists) >= 0)
        assert dists[-1] == np.ceil(2.0 * 2048.0)

    def test_higher_lod_error_pulls_distances_in(self):
        cam = make_cam(screen=(1280, 720))
        d1, _ = cm.setup_lods(cam, 1024, lod_error=1.0)
        d2, _ = cm.setup_lods(cam, 1024, lod_error=4.0)
        assert np.all(d2[:-1] <= d1[:-1])


class TestHorizonLimit:
    def test_clamps_small_pitch(self):
        cam = make_cam(pitch_deg=0.0)
        out = cm.limit_rotation_horizon(cam)
        assert abs(np.sin(np.deg2rad(out.pitch_deg))) >= 0.001

    def test_leaves_normal_pitch(self):
        cam = make_cam(pitch_deg=25.0)
        assert cm.limit_rotation_horizon(cam).pitch_deg == 25.0
