"""Batched multi-camera rendering vs per-camera rendering."""
import numpy as np

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.parallel.batch import render_camera_batch
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer


def test_batch_matches_individual():
    w = scenes.random_world(n=300, seed=5)
    lods = [w] * 6
    cfg = RenderConfig(width=64, height=48, chunk_steps=8, max_march_chunks=48,
                       backend="xla")
    r = Renderer.create(lods, cfg)
    cams = [
        cm.Camera(position=(8, 10, 8), pitch_deg=25.0, yaw_deg=70.0),
        cm.Camera(position=(4, 6, 3), pitch_deg=10.0, yaw_deg=200.0),
        cm.Camera(position=(8, 6, 8), pitch_deg=-15.0, yaw_deg=30.0),  # looks up
        cm.Camera(position=(12, 9, 12), pitch_deg=45.0, yaw_deg=310.0),
    ]
    batch = np.asarray(render_camera_batch(r, cams))
    assert batch.shape == (4, 48, 64)
    for i, cam in enumerate(cams):
        single = r.render(cam)
        assert np.array_equal(batch[i], single), f"camera {i} differs"


def test_batch_pallas_matches_xla_batch():
    """The batched march through the Pallas path (staged compaction + bucket
    padding) must match the XLA batch exactly."""
    w = scenes.random_world(n=300, seed=5)
    lods = [w] * 6
    cams = [
        cm.Camera(position=(8, 10, 8), pitch_deg=25.0, yaw_deg=70.0),
        cm.Camera(position=(4, 6, 3), pitch_deg=10.0, yaw_deg=200.0),
        cm.Camera(position=(8, 6, 8), pitch_deg=-15.0, yaw_deg=30.0),
        cm.Camera(position=(12, 9, 12), pitch_deg=45.0, yaw_deg=310.0),
        cm.Camera(position=(2, 12, 14), pitch_deg=60.0, yaw_deg=120.0),
    ]
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = RenderConfig(width=64, height=48, chunk_steps=8,
                           max_march_chunks=48, backend=backend,
                           pallas_interpret=True)
        r = Renderer.create(lods, cfg)
        outs[backend] = np.asarray(render_camera_batch(r, cams))
    assert np.array_equal(outs["xla"], outs["pallas"])


def test_batch_gated_lite_matches_individual():
    """Batched pallas through the GATED path (occupancy tiles + adaptive lite
    records thread as batch statics): each camera's slice must equal its
    per-camera render bitwise."""
    import scenes as sc

    lods = sc.deep_tower_world()
    cfg = RenderConfig(width=64, height=48, chunk_steps=32,
                       max_march_chunks=64, backend="pallas",
                       pallas_interpret=True, occupancy_gate="on",
                       lite_records="auto")
    r = Renderer.create(lods, cfg)
    assert r.occupancy_on and r.lite_runs_resolved > 0
    cams = [
        cm.Camera(position=(32, 40, 32), pitch_deg=20.0, yaw_deg=35.0),
        cm.Camera(position=(20, 30, 44), pitch_deg=-15.0, yaw_deg=220.0),
        cm.Camera(position=(8, 45, 8), pitch_deg=35.0, yaw_deg=45.0),
    ]
    batch = np.asarray(render_camera_batch(r, cams))
    for i, cam in enumerate(cams):
        single = r.render(cam)
        assert np.array_equal(batch[i], single), f"camera {i} differs"
