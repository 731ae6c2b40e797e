"""Interactive session: controllers wired to the renderer (the reference's
UnityManager.Update input loop, UnityManager.cs:77-161)."""
import numpy as np

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.frontend.interactive import InteractiveSession, _ansi_frame
from cpuvox_tpu.render.controller import FlyMovement, MouseLook
from cpuvox_tpu.render import camera as cm


def _session():
    w = scenes.flat_floor_world(dims=(32, 16, 32), y=2)
    cfg = RenderConfig(width=64, height=48, chunk_steps=8, max_march_chunks=32,
                       backend="xla")
    return InteractiveSession.create([w] * 6, cfg)


def test_step_renders_and_moves():
    s = _session()
    p0 = np.asarray(s.cam.position)
    f0 = s.step(0.1, forward=1.0)
    assert f0.shape == (48, 64)
    assert np.all((f0 >> 24) == 0xFF)
    p1 = np.asarray(s.cam.position)
    assert not np.allclose(p0, p1), "forward motion must move the camera"
    assert s.fps > 0


def test_mouse_look_smoothing_and_pitch_clamp():
    look = MouseLook(sensitivity=8.0, smoothing=3.0)
    cam = cm.Camera(position=(1, 1, 1), pitch_deg=0.0, yaw_deg=0.0,
                    screen=(64, 48))
    c1 = look.update(cam, mouse_dx=1.0, mouse_dy=0.0)
    c2 = look.update(c1, mouse_dx=1.0, mouse_dy=0.0)
    assert c1.yaw_deg > 0
    # smoothing: the second equal input turns further than the first
    assert (c2.yaw_deg - c1.yaw_deg) > c1.yaw_deg
    for _ in range(200):  # pitch clamps at +-90 (SmoothMouseLook.cs:60-66)
        cam = look.update(cam, 0.0, -10.0)
    assert cam.pitch_deg == 90.0


def test_fly_speed_scroll():
    fly = FlyMovement(move_speed=50.0)
    fly.scroll(+1)
    assert np.isclose(fly.move_speed, 55.0)
    fly.scroll(-1)
    assert np.isclose(fly.move_speed, 49.5)


def test_render_mode_switch_matches_reference_keys():
    s = _session()
    screen = s.step(0.016, mode=1)
    td = s.step(0.016, mode=2)
    lr = s.step(0.016, mode=3)
    # raybuffer views have raybuffer shapes, not screen shape
    assert screen.shape == (48, 64)
    assert td.shape != screen.shape and lr.shape != screen.shape
    assert s.mode == 3


def test_ansi_frame_shapes():
    frame = np.full((48, 64), 0xFF336699, np.uint32)
    text = _ansi_frame(frame, cols=20, rows=10)
    assert len(text.splitlines()) == 10
    assert "\x1b[38;2;51;102;153m" in text
