"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    screen = jax.jit(fn)(*args)
    arr = np.asarray(screen)
    assert arr.shape == (120, 160)
    # terrain scene from above: most pixels are terrain, not skybox
    assert np.mean(arr != np.uint32(0xFF191919)) > 0.3


def test_single_frame_ray_sharded_pallas():
    """ONE camera's frame sharded over all 8 devices through the Pallas fast
    path (shard_map over the ray axis, raybuffer all-gathered for phase 2) —
    must equal the single-device render bit-exactly."""
    import numpy as np

    import scenes
    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.parallel.mesh import RenderMesh, render_frame_sharded
    from cpuvox_tpu.render import camera as cm
    from cpuvox_tpu.render.frame import Renderer

    w = scenes.random_world(n=250, seed=4)
    for occ in ("off", "on"):
        cfg = RenderConfig(width=64, height=48, chunk_steps=8,
                           max_march_chunks=48, backend="pallas",
                           pallas_interpret=True, occupancy_gate=occ)
        r = Renderer.create([w] * 6, cfg)
        cam = cm.Camera(position=(8, 9, 8), pitch_deg=25.0, yaw_deg=70.0,
                        screen=(64, 48))
        rmesh = RenderMesh.create(cam_axis=2)
        sharded = render_frame_sharded(r, cam, rmesh)
        local = r.render(cam)
        np.testing.assert_array_equal(sharded, local)


def test_camera_sharded_rollout_pallas():
    """shard_map camera-data-parallel rollout (the Pallas-path multi-chip
    story): every chip renders its camera slice locally; output must equal the
    single-device batch exactly."""
    import numpy as np

    import scenes
    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.parallel.batch import render_camera_batch
    from cpuvox_tpu.parallel.mesh import RenderMesh
    from cpuvox_tpu.render import camera as cm
    from cpuvox_tpu.render.frame import Renderer

    w = scenes.random_world(n=250, seed=4)
    cfg = RenderConfig(width=64, height=48, chunk_steps=8, max_march_chunks=48,
                       backend="pallas", pallas_interpret=True)
    r = Renderer.create([w] * 6, cfg)
    cams = [cm.Camera(position=(8, 9, 8), pitch_deg=20.0 + 3 * i,
                      yaw_deg=45.0 * i) for i in range(8)]
    rmesh = RenderMesh.create(cam_axis=2)
    sharded = np.asarray(render_camera_batch(r, cams, rmesh=rmesh))
    local = np.asarray(render_camera_batch(r, cams))
    np.testing.assert_array_equal(sharded, local)
