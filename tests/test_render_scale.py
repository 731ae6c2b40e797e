"""render_scale: low-res render + native nearest upscale (the reference's scaled
"fake camera" path, UnityManager.cs:35-36,57-63,179-182)."""
import numpy as np

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer


def test_render_scale_matches_manual_upscale():
    w = scenes.flat_floor_world()
    cam = cm.Camera(position=(8, 5, 8), pitch_deg=30.0, yaw_deg=40.0,
                    screen=(64, 48))
    lods = [w] * 6

    lo = Renderer.create(lods, RenderConfig(width=32, height=24, backend="xla",
                                            chunk_steps=8, max_march_chunks=32))
    img_lo = lo.render(cam)
    assert img_lo.shape == (24, 32)

    scaled = Renderer.create(lods, RenderConfig(
        width=64, height=48, render_scale=0.5, backend="xla",
        chunk_steps=8, max_march_chunks=32))
    img = scaled.render(cam)
    assert img.shape == (48, 64)

    ys = (np.arange(48) * 24) // 48
    xs = (np.arange(64) * 32) // 64
    np.testing.assert_array_equal(img, img_lo[ys][:, xs])


def test_render_scale_one_is_identity():
    w = scenes.flat_floor_world()
    cam = cm.Camera(position=(8, 4, 8), pitch_deg=20.0, yaw_deg=0.0,
                    screen=(64, 48))
    r1 = Renderer.create([w] * 6, RenderConfig(width=64, height=48,
                                               backend="xla", chunk_steps=8,
                                               max_march_chunks=32))
    r2 = Renderer.create([w] * 6, RenderConfig(width=64, height=48,
                                               render_scale=1.0, backend="xla",
                                               chunk_steps=8,
                                               max_march_chunks=32))
    np.testing.assert_array_equal(r1.render(cam), r2.render(cam))
