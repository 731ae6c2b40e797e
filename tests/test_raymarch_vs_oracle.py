"""Bit-equality tests: vectorized XLA phase-1/phase-2 vs the scalar oracle (CPU)."""
import numpy as np
import pytest

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world import rle

SCREEN = (64, 48)


def compare_frame(world_or_lods, campos, pitch, yaw=0.0, screen=SCREEN,
                  lod_distances=None, roll=0.0):
    if isinstance(world_or_lods, rle.WorldLOD):
        lods = [world_or_lods] * 6
    else:
        lods = world_or_lods
    cam0 = cm.Camera(position=campos, pitch_deg=pitch, yaw_deg=yaw,
                     roll_deg=roll, screen=screen)

    # oracle
    oscreen, (otd, olr, segs, ctxs, vps, cam_data, cam) = scenes.render_oracle_frame(
        lods, cam0, lod_distances=lod_distances)

    # vectorized — same lod distances / far clip
    cfg = RenderConfig(width=screen[0], height=screen[1], chunk_steps=8,
                       max_march_chunks=64, backend="xla")
    r = Renderer.create(lods, cfg)
    r.lod_distances = np.asarray(cam_data.lod_distances)
    r.far_clip = float(cam_data.far_clip)
    vscreen, (vtd, vlr, *_rest) = r.render(cam0, return_raybuffers=True)

    return oscreen, otd, olr, vscreen, vtd, vlr


def assert_buffers_equal(otd, olr, vtd, vlr, tag=""):
    assert otd.shape == vtd.shape, (tag, otd.shape, vtd.shape)
    assert olr.shape == vlr.shape
    td_diff = np.nonzero(otd != vtd)
    lr_diff = np.nonzero(olr != vlr)
    td_n = td_diff[0].size
    lr_n = lr_diff[0].size
    if td_n or lr_n:
        detail = []
        for name, (diff, o, v) in [("td", (td_diff, otd, vtd)),
                                   ("lr", (lr_diff, olr, vlr))]:
            for r_, p_ in list(zip(*diff))[:8]:
                detail.append(f"{name}[{r_},{p_}]: oracle={o[r_, p_]:#x} "
                              f"vec={v[r_, p_]:#x}")
        raise AssertionError(
            f"{tag}: {td_n} topdown + {lr_n} leftright texels differ\n"
            + "\n".join(detail))


CASES = [
    ("floor_down", "floor", (8, 6, 8), 85.0, 0.0),
    ("floor_mid", "floor", (8, 5, 8), 30.0, 20.0),
    ("floor_gentle", "floor", (8, 3, 8), 8.0, 45.0),
    ("floor_up", "floor", (8, 6, 8), -35.0, 10.0),
    ("tower", "tower", (8.5, 5, 2), 5.0, 0.0),
    ("random_low", "random", (8, 10, 8), 25.0, 70.0),
    ("random_up", "random", (8, 6, 8), -15.0, 200.0),
    ("outside_world", "random", (-20.0, 8, -10.0), 12.0, 25.0),
]


@pytest.mark.parametrize("name,scene,pos,pitch,yaw", CASES)
def test_raybuffers_match_oracle(name, scene, pos, pitch, yaw):
    if scene == "floor":
        w = scenes.flat_floor_world()
    elif scene == "tower":
        w = scenes.tower_world(x=8, z=12, height=10)
    else:
        w = scenes.random_world(n=300, seed=5)
    oscreen, otd, olr, vscreen, vtd, vlr = compare_frame(w, pos, pitch, yaw)
    assert_buffers_equal(otd, olr, vtd, vlr, tag=name)
    sdiff = int(np.sum(oscreen != vscreen))
    assert sdiff == 0, f"{name}: {sdiff} screen pixels differ"


# camera ROLL cases: the benchmark path rolls the camera 180->360 degrees over
# its last eighth (bench/path.py _ROT_KEYS), so recorded TPU numbers exercise
# rolled frames — these pin the oracle equality there (VERDICT r2 weak #3)
ROLL_CASES = [
    ("roll30", "floor", (8, 5, 8), 30.0, 20.0, 30.0),
    ("roll180", "random", (8, 10, 8), 25.0, 70.0, 180.0),
    ("roll359", "tower", (8.5, 5, 2), 5.0, 0.0, 359.0),
    ("roll90_up", "random", (8, 6, 8), -15.0, 200.0, 90.0),
]


@pytest.mark.parametrize("name,scene,pos,pitch,yaw,roll", ROLL_CASES)
def test_raybuffers_match_oracle_rolled(name, scene, pos, pitch, yaw, roll):
    if scene == "floor":
        w = scenes.flat_floor_world()
    elif scene == "tower":
        w = scenes.tower_world(x=8, z=12, height=10)
    else:
        w = scenes.random_world(n=300, seed=5)
    oscreen, otd, olr, vscreen, vtd, vlr = compare_frame(w, pos, pitch, yaw,
                                                         roll=roll)
    assert_buffers_equal(otd, olr, vtd, vlr, tag=name)
    assert int(np.sum(oscreen != vscreen)) == 0, f"{name}: screens differ"


def test_lod_chain_matches():
    w0 = scenes.flat_floor_world(dims=(64, 16, 64))
    lods = rle.build_lod_chain(w0, 6)
    lod_distances = np.array([8, 16, 32, 64, 128, 512], np.float32)
    oscreen, otd, olr, vscreen, vtd, vlr = compare_frame(
        lods, (32, 4, 32), 12.0, yaw=30.0, lod_distances=lod_distances)
    assert_buffers_equal(otd, olr, vtd, vlr, tag="lod_chain")
    assert np.array_equal(oscreen, vscreen)


def test_mill_scene_matches():
    from cpuvox_tpu.assets.pipeline import convert_obj_to_world

    lods = convert_obj_to_world("/root/reference/datasets/mill.obj",
                                max_dimension=32, lod_levels=6)
    oscreen, otd, olr, vscreen, vtd, vlr = compare_frame(
        lods, (16.0, 18.0, -12.0), 14.0, 0.0)
    assert_buffers_equal(otd, olr, vtd, vlr, tag="mill")
    assert np.array_equal(oscreen, vscreen)


def test_banded_resolve_matches_plain():
    """resolve_colors_banded (band-conditional gather skip for all-sky 8-row
    bands) must be bit-identical to resolve_colors on screens mixing all-sky
    bands, partial bands, out-of-range (<0) pixels, and odd heights."""
    import jax.numpy as jnp
    import numpy as np

    from cpuvox_tpu.render import raymarch as rm

    rng = np.random.default_rng(7)
    colors = jnp.asarray(rng.integers(0, 2**32, size=257, dtype=np.uint64)
                         .astype(np.uint32))
    for h, w in ((64, 128), (37, 128), (24, 256)):
        idx = rng.integers(1, 257, size=(h, w)).astype(np.int32)
        idx[: h // 3] = 0                       # all-sky top third
        idx[h // 3, : w // 2] = 0               # partial band
        idx[h // 2, ::7] = -1                   # unwritten -> magenta
        idx[-1, : w // 4] = -1
        idx_j = jnp.asarray(idx)
        plain = np.asarray(rm.resolve_colors(idx_j, colors))
        banded = np.asarray(rm.resolve_colors_banded(idx_j, colors))
        assert np.array_equal(plain, banded), (h, w)
