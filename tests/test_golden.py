"""Golden-fixture regression tests (VERDICT r1 item 7).

The fixtures in tests/golden/ pin the verified oracle output of a fixed scene set;
the fast XLA renderer (bit-equal to the oracle by test_raymarch_vs_oracle) is
checked against them so NO refactor can silently shift pixels.  Regenerate with
tests/make_golden.py only after a deliberate, verified semantic change.
"""
import os

import numpy as np
import pytest

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer

from make_golden import CASES, GOLDEN_DIR, build


@pytest.mark.parametrize("name,scene,pos,pitch,yaw,roll", CASES)
def test_xla_matches_golden(name, scene, pos, pitch, yaw, roll):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), f"missing fixture {path} (run tests/make_golden.py)"
    g = np.load(path)
    w = build(scene)
    cfg = RenderConfig(width=64, height=48, backend="xla", chunk_steps=8,
                       max_march_chunks=64)
    r = Renderer.create([w] * 6, cfg)
    cam = cm.Camera(position=pos, pitch_deg=pitch, yaw_deg=yaw,
                    roll_deg=roll, screen=(64, 48))
    screen, (td, lr, *_rest) = r.render(cam, return_raybuffers=True)
    np.testing.assert_array_equal(td, g["td"][:td.shape[0], :td.shape[1]],
                                  err_msg=f"{name}: topdown raybuffer drifted")
    np.testing.assert_array_equal(lr, g["lr"][:lr.shape[0], :lr.shape[1]],
                                  err_msg=f"{name}: leftright raybuffer drifted")
    np.testing.assert_array_equal(screen, g["screen"],
                                  err_msg=f"{name}: screen drifted")


def test_oracle_matches_golden_spot():
    """One slow oracle-vs-fixture case: the fixture generator itself regressed?"""
    name, scene, pos, pitch, yaw, roll = CASES[1]
    g = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    w = build(scene)
    cam = cm.Camera(position=pos, pitch_deg=pitch, yaw_deg=yaw,
                    roll_deg=roll, screen=(64, 48))
    screen, _ = scenes.render_oracle_frame(w, cam)
    np.testing.assert_array_equal(screen, g["screen"])


def test_mill_lod_oracle_exactness():
    """Mesh-derived content + LOD chain + outside-world camera: the round-2
    regression where device-init FMA drift flipped ~110 px (fixed by host init;
    cpuvox_tpu/config.py host_init)."""
    from cpuvox_tpu.assets.pipeline import convert_obj_to_world

    lods = convert_obj_to_world("/root/reference/datasets/mill.obj",
                                max_dimension=64, lod_levels=6)
    cam = cm.Camera(position=(32, 35, -30.0), pitch_deg=14.0, yaw_deg=0.0,
                    screen=(80, 60))
    screen, _ = scenes.render_oracle_frame(
        lods, cam, lod_distances="renderer")
    cfg = RenderConfig(width=80, height=60, backend="xla", chunk_steps=8,
                       max_march_chunks=96)
    r = Renderer.create(lods, cfg)
    s = r.render(cam)
    np.testing.assert_array_equal(s, screen)
