"""Dynamic on-device world rebuild tests."""
import numpy as np

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.models.dynamic_demo import DynamicTerrain
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.utils.colors import DEBUG_MAGENTA, SKYBOX
from cpuvox_tpu.world.dynamic import (SurfaceWorldSpec,
                                      build_surface_world_arrays, terrain_colors)


def test_surface_arrays_consistent():
    import jax.numpy as jnp

    spec = SurfaceWorldSpec(dims=(16, 32, 16), depth=4, lod_levels=3)
    top = jnp.full((16, 16), 10, jnp.int32)
    wa = build_surface_world_arrays(spec, top, terrain_colors(spec, top))
    rec = np.asarray(wa.col_rec)
    assert np.all(rec[:, 0] == 3)
    runs = np.asarray(wa.runs)
    # LOD0 column 0: air above = 31-10=21, solid 4, air below = 7
    assert runs[0] == ((-1 << 16) | 21)
    assert runs[1] == 4
    assert runs[2] == ((-1 << 16) | 7)
    runs_rev = np.asarray(wa.runs_rev)
    assert runs_rev[0] == ((-1 << 16) | 7)
    assert runs_rev[2] == ((-1 << 16) | 21)
    # lod bases and color offsets are consistent
    assert rec[0, 2] == 1  # skybox shift
    assert np.asarray(wa.colors).shape[0] == 1 + (16 * 16 + 8 * 8 + 4 * 4) * 4


def test_dynamic_terrain_renders_and_animates():
    dt = DynamicTerrain.create(dims=(32, 16, 32), depth=3,
                               config=RenderConfig(width=64, height=48,
                                                   chunk_steps=8,
                                                   max_march_chunks=24))
    cam = cm.Camera(position=(16, 12, 4), pitch_deg=25.0, yaw_deg=10.0)
    f0 = np.asarray(dt.render_frame(0.0, cam))
    f1 = np.asarray(dt.render_frame(1.5, cam))
    assert f0.shape == (48, 64)
    assert not np.any(f0 == DEBUG_MAGENTA)
    assert np.mean(f0 != SKYBOX) > 0.3  # terrain visible
    assert np.any(f0 != f1)  # the edit changed the image
