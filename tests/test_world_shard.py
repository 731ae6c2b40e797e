"""World-sharded rendering (parallel/world_shard.py, DESIGN_WORLD_SHARD.md):
LOD0 tiles striped over an 8-device mesh + camera-local window exchange must be
bit-identical to the plain replicated Renderer."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.models.procedural import heightmap_world
from cpuvox_tpu.parallel.world_shard import ShardedRenderer, ShardedWorld
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer

SCREEN = (96, 64)


def _mesh():
    return Mesh(np.array(jax.devices()), axis_names=("world",))


def _world(n=128):
    return heightmap_world(dims=(n, 64, n), seed=7, shell_depth=4,
                           lod_levels=4)


@pytest.fixture(scope="module")
def small_world():
    return _world(128)


def _cfg(**kw):
    kw.setdefault("backend", "xla")
    return RenderConfig(width=SCREEN[0], height=SCREEN[1], **kw)


def test_sharded_matches_replicated(small_world):
    """Window a strict subset of the grid; several cameras, both iteration
    directions; every frame bit-equal to the replicated renderer."""
    lods = small_world
    cfg = _cfg()
    plain = Renderer.create(lods, cfg)
    sr = ShardedRenderer(lods, _mesh(), cfg, tile_cols=16)
    cams = [
        cm.Camera(position=(64.0, 40.0, 64.0), pitch_deg=18.0, yaw_deg=30.0,
                  screen=SCREEN),
        cm.Camera(position=(64.0, 50.0, 64.0), pitch_deg=-25.0, yaw_deg=200.0,
                  screen=SCREEN),  # upward iteration direction
        cm.Camera(position=(5.0, 45.0, 5.0), pitch_deg=10.0, yaw_deg=45.0,
                  screen=SCREEN),  # window clipped at the world corner
        cm.Camera(position=(120.0, 35.0, 10.0), pitch_deg=30.0, yaw_deg=160.0,
                  screen=SCREEN),
    ]
    # force a finite LOD0 radius so the window is a strict grid subset and the
    # sentinel path is live (default small-world lod_distances can be inf)
    plain.render(cams[0])
    if not np.isfinite(plain.lod_distances[0]) or plain.lod_distances[0] > 24:
        ld = plain.lod_distances.copy()
        ld[0] = 20.0
        plain.lod_distances = ld
        sr.inner.lod_distances = ld.copy()
        sr.inner.far_clip = plain.far_clip  # setup_camera skips recompute
    nt = sr.sw.nt_x
    for cam in cams:
        a = plain.render(cam)
        b = sr.render(cam)
        assert np.array_equal(a, b), int((a != b).sum())
    assert sr._window_key[2] < nt  # the window was a strict grid subset


def test_window_memoization(small_world):
    """Static camera: one exchange; far teleport: a second one."""
    lods = small_world
    sr = ShardedRenderer(lods, _mesh(), _cfg(), tile_cols=16)
    plain = Renderer.create(lods, _cfg())
    plain.render(cm.Camera(position=(64.0, 40.0, 64.0), screen=SCREEN))
    ld = plain.lod_distances.copy()
    ld[0] = 20.0
    plain.lod_distances = ld
    sr.inner.lod_distances = ld.copy()
    sr.inner.far_clip = plain.far_clip
    cam = cm.Camera(position=(30.0, 40.0, 30.0), pitch_deg=15.0, yaw_deg=10.0,
                    screen=SCREEN)
    sr.render(cam)
    n1 = sr._n_exchanges
    sr.render(cam)
    assert sr._n_exchanges == n1  # memoized window, zero exchange traffic
    cam2 = cm.Camera(position=(100.0, 40.0, 100.0), pitch_deg=15.0,
                     yaw_deg=10.0, screen=SCREEN)
    a = plain.render(cam2)
    b = sr.render(cam2)
    assert sr._n_exchanges == n1 + 1
    assert np.array_equal(a, b)


def test_owner_striping_covers_all_tiles(small_world):
    """Every tile is owned by exactly one chip and round-trips through the
    exchange with its exact record + color bytes."""
    import jax.numpy as jnp

    lods = small_world
    mesh = _mesh()
    sw = ShardedWorld.build(lods, mesh, tile_cols=32)
    ex = sw.make_exchange()
    nt = sw.nt_x * sw.nt_z
    got = ex({"fwd": sw.owned_fwd, "rev": sw.owned_rev,
              "colors": sw.owned_colors}, ("fwd", "rev"),
             jnp.arange(nt, dtype=jnp.int32))
    f, c = got["fwd"], got["colors"]
    # reassemble the original LOD0 concat layout from the fetched tiles
    from cpuvox_tpu.render.device import build_device_world

    dw = build_device_world(lods)
    t = 1 << sw.tl
    x0, z0 = lods[0].grid_dims
    got = np.asarray(f).reshape(sw.nt_x, sw.nt_z, t, t, sw.rec_w)
    got = np.moveaxis(got, 2, 1).reshape(x0 * z0, sw.rec_w)
    ref = dw.rec_fwd[:x0 * z0]
    # slot 1 was rewritten to active-layout color offsets; compare the rest
    keep = np.ones(sw.rec_w, bool)
    keep[1] = False
    assert np.array_equal(got[:, keep], ref[:, keep])
    # colors: one block per tile (values are proven end-to-end by the
    # bit-equality render tests above)
    assert np.asarray(c).view(np.uint32).shape == (nt, sw.cb)


def test_sharded_gated_lite_pallas_matches_replicated():
    """Mill-class sharded world: occupancy tiles and adaptive lite records are
    striped with the record tiles, so the gated two-stage Pallas march (and
    its lite/deep split) runs against the ACTIVE window — bit-equal to the
    plain replicated renderer, including with a strict-subset window."""
    import scenes

    lods = scenes.deep_tower_world()
    cfg = _cfg(backend="pallas", pallas_interpret=True, occupancy_gate="on",
               chunk_steps=32, max_march_chunks=64, lite_records="auto")
    plain = Renderer.create(lods, cfg)
    sr = ShardedRenderer(lods, _mesh(), cfg, tile_cols=16)
    assert sr.sw.owned_occ is not None
    assert plain.occupancy_on and sr.inner.occupancy_on
    assert sr.sw.lite_runs == plain.device_world.lite_runs > 0
    cams = [cm.Camera(position=(32.0, 40.0, 32.0), pitch_deg=20.0,
                      yaw_deg=35.0, screen=SCREEN),
            cm.Camera(position=(20.0, 30.0, 44.0), pitch_deg=-15.0,
                      yaw_deg=220.0, screen=SCREEN)]
    plain.render(cams[0])
    ld = plain.lod_distances.copy()
    ld[0] = 10.0  # strict-subset window: 3 of 4 tiles per side
    plain.lod_distances = ld
    sr.inner.lod_distances = ld.copy()
    sr.inner.far_clip = plain.far_clip
    for cam in cams:
        a = plain.render(cam)
        b = sr.render(cam)
        assert np.array_equal(a, b), int((a != b).sum())
    assert sr._window_key[2] < sr.sw.nt_x


def test_composed_world_and_ray_sharding():
    """COMPOSED modes (VERDICT r3 missing #4): LOD0 tiles owner-striped over
    the world mesh AND one camera's rays sharded over all 8 devices through
    the Pallas fast path against the activated window — bit-equal to the
    plain replicated single-device renderer."""
    import scenes
    from cpuvox_tpu.parallel.mesh import RenderMesh

    lods = scenes.deep_tower_world()
    cfg = _cfg(backend="pallas", pallas_interpret=True, occupancy_gate="on",
               chunk_steps=32, max_march_chunks=64)
    plain = Renderer.create(lods, cfg)
    rmesh = RenderMesh.create(cam_axis=2)
    sr = ShardedRenderer(lods, _mesh(), cfg, tile_cols=16, ray_mesh=rmesh)
    cams = [cm.Camera(position=(32.0, 40.0, 32.0), pitch_deg=20.0,
                      yaw_deg=35.0, screen=SCREEN),
            cm.Camera(position=(20.0, 30.0, 44.0), pitch_deg=-15.0,
                      yaw_deg=220.0, screen=SCREEN)]
    plain.render(cams[0])
    ld = plain.lod_distances.copy()
    ld[0] = 10.0  # strict-subset window
    plain.lod_distances = ld
    sr.inner.lod_distances = ld.copy()
    sr.inner.far_clip = plain.far_clip
    for cam in cams:
        a = plain.render(cam)
        b = sr.render(cam)
        assert np.array_equal(a, b), int((a != b).sum())
    assert sr._window_key[2] < sr.sw.nt_x


def test_rejects_unsupported_layouts(small_world):
    with pytest.raises(ValueError):
        ShardedRenderer(small_world, _mesh(), _cfg(argb_records=True))
    with pytest.raises(ValueError):
        ShardedWorld.build(small_world, _mesh(), tile_cols=24)  # not pow2
