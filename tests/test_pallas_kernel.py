"""Pallas phase-1 kernel (interpret mode on CPU) vs the XLA reference path."""
import numpy as np
import pytest

import scenes
from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world import rle

SCREEN = (64, 48)


def render_both(world_or_lods, campos, pitch, yaw=0.0, screen=SCREEN,
                occupancy_gate="off", roll=0.0):
    lods = [world_or_lods] * 6 if isinstance(world_or_lods, rle.WorldLOD) \
        else world_or_lods
    cam = cm.Camera(position=campos, pitch_deg=pitch, yaw_deg=yaw,
                    roll_deg=roll, screen=screen)
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = RenderConfig(width=screen[0], height=screen[1], chunk_steps=8,
                           max_march_chunks=64, backend=backend,
                           pallas_interpret=True, block_groups=2,
                           occupancy_gate=occupancy_gate)
        r = Renderer.create(lods, cfg)
        outs[backend] = r.render(cam, return_raybuffers=True)
    return outs


CASES = [
    ("floor_down", "floor", (8, 6, 8), 85.0, 0.0),
    ("floor_gentle", "floor", (8, 3, 8), 8.0, 45.0),
    ("floor_up", "floor", (8, 6, 8), -35.0, 10.0),
    ("tower", "tower", (8.5, 5, 2), 5.0, 0.0),
    ("random", "random", (8, 10, 8), 25.0, 70.0),
    # adversarial: near-vertical pitch (VP far off-screen / at infinity after the
    # horizon clamp), both iteration directions, oblique yaw (VERDICT r1 item 2)
    ("floor_plunge", "floor", (8, 12, 8), 89.0, 30.0),
    ("floor_zenith", "random", (8, 2, 8), -89.0, 60.0),
    ("tower_horizon", "tower", (8.5, 5, 2), 0.0, 0.0),
    ("random_up", "random", (8, 13, 8), -60.0, 200.0),
    ("outside_world", "random", (-6, 9, -6), 30.0, 45.0),
]


@pytest.mark.parametrize("occupancy", ["off", "on"])
@pytest.mark.parametrize("name,scene,pos,pitch,yaw", CASES)
def test_pallas_matches_xla(name, scene, pos, pitch, yaw, occupancy):
    if scene == "floor":
        w = scenes.flat_floor_world()
    elif scene == "tower":
        w = scenes.tower_world(x=8, z=12, height=10)
    else:
        w = scenes.random_world(n=300, seed=5)
    outs = render_both(w, pos, pitch, yaw, occupancy_gate=occupancy)
    xs, (xtd, xlr, *_) = outs["xla"]
    ps, (ptd, plr, *_) = outs["pallas"]
    td_diff = int(np.sum(xtd != ptd))
    lr_diff = int(np.sum(xlr != plr))
    if td_diff or lr_diff:
        d = np.nonzero(xtd != ptd)
        detail = [f"td[{r},{p}]: xla={xtd[r, p]:#x} pallas={ptd[r, p]:#x}"
                  for r, p in list(zip(*d))[:10]]
        raise AssertionError(
            f"{name}: {td_diff} td + {lr_diff} lr texels differ\n" + "\n".join(detail))
    assert np.array_equal(xs, ps), f"{name}: screens differ"


@pytest.mark.parametrize("name,scene,pos,pitch,yaw,roll", [
    ("roll30", "floor", (8, 5, 8), 30.0, 20.0, 30.0),
    ("roll180", "random", (8, 10, 8), 25.0, 70.0, 180.0),
    ("roll359", "tower", (8.5, 5, 2), 5.0, 0.0, 359.0),
])
def test_pallas_matches_xla_rolled(name, scene, pos, pitch, yaw, roll):
    """Rolled cameras (the bench path rolls 180->360 over its last eighth)."""
    if scene == "floor":
        w = scenes.flat_floor_world()
    elif scene == "tower":
        w = scenes.tower_world(x=8, z=12, height=10)
    else:
        w = scenes.random_world(n=300, seed=5)
    outs = render_both(w, pos, pitch, yaw, occupancy_gate="on", roll=roll)
    xs, (xtd, xlr, *_) = outs["xla"]
    ps, (ptd, plr, *_) = outs["pallas"]
    assert np.array_equal(xtd, ptd), name
    assert np.array_equal(xlr, plr), name
    assert np.array_equal(xs, ps), name


@pytest.mark.parametrize("occupancy", ["off", "on"])
def test_pallas_lod_chain(occupancy):
    w0 = scenes.flat_floor_world(dims=(64, 16, 64))
    lods = rle.build_lod_chain(w0, 6)
    outs = render_both(lods, (32, 4, 32), 12.0, yaw=30.0,
                       occupancy_gate=occupancy)
    xs, (xtd, xlr, *_) = outs["xla"]
    ps, (ptd, plr, *_) = outs["pallas"]
    assert np.array_equal(xtd, ptd)
    assert np.array_equal(xlr, plr)


@pytest.mark.parametrize("occupancy", ["off", "on"])
def test_pallas_deep_split_layout(occupancy):
    """Deep columns (> INLINE_MAX_RUNS runs -> split record layout) on a mostly
    empty world; max_runs % RB_CAP != 0 also exercises the clamped run-sweep
    index (ADVICE r2 medium)."""
    from cpuvox_tpu.render.device import INLINE_MAX_RUNS

    dims = (64, 256, 64)
    xzs, yss = [], []
    for x, z in [(20, 20), (43, 27), (26, 53)]:
        ys = np.arange(0, 256, 2)  # alternating voxel/air: ~255 runs
        xzs.append(np.full(ys.shape[0], x * dims[2] + z))
        yss.append(ys)
    xz = np.concatenate(xzs)
    y = np.concatenate(yss)
    rgb = tuple(np.full(xz.shape[0], v, np.uint8) for v in (200, 90, 30))
    w = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
    assert int(np.asarray(w.col_runs).max()) > INLINE_MAX_RUNS
    outs = render_both(rle.build_lod_chain(w, 6), (32.0, 128.0, -6.0), 20.0,
                       yaw=15.0, occupancy_gate=occupancy)
    xs, (xtd, xlr, *_) = outs["xla"]
    ps, (ptd, plr, *_) = outs["pallas"]
    assert np.array_equal(xtd, ptd)
    assert np.array_equal(xlr, plr)


@pytest.mark.parametrize("block_fetch,drain_groups",
                         [("off", 0), ("on", 0), ("off", 4)])
def test_pallas_occupancy_rewind_matches_xla(block_fetch, drain_groups):
    """chunk=32 with the gate ON on DENSE content: every ray has more gated
    cells per chunk than one group covers.  With block_fetch OFF the policy
    is one group per chunk, so the rewind path (restore the pre-switch DDA
    state at the first unprocessed cell) runs constantly; with block_fetch ON
    the multi-group drain covers the chunk in C/GK groups.  Both must stay
    bit-exact — including across LOD switches (tight lod distances)."""
    w0 = scenes.flat_floor_world(dims=(64, 16, 64))
    lods = rle.build_lod_chain(w0, 6)
    cam = cm.Camera(position=(32, 4, 32), pitch_deg=12.0, yaw_deg=30.0,
                    screen=SCREEN)
    outs = {}
    for backend in ("xla", "pallas"):
        cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=32,
                           max_march_chunks=64, backend=backend,
                           pallas_interpret=True, occupancy_gate="on",
                           block_fetch=block_fetch,
                           drain_groups=drain_groups, lod_error=4.0)
        r = Renderer.create(lods, cfg)
        r.lod_distances = np.array([6, 12, 20, 32, 48, 96], np.float32)
        r.far_clip = 256.0
        outs[backend] = r.render(cam, return_raybuffers=True)
    xs, (xtd, xlr, *_) = outs["xla"]
    ps, (ptd, plr, *_) = outs["pallas"]
    assert np.array_equal(xtd, ptd)
    assert np.array_equal(xlr, plr)
    assert np.array_equal(xs, ps)


def test_pallas_occupancy_lite_records_matches_xla():
    """Deep-RLE INLINE world (the adaptive tier picker builds lite records):
    runs of adjacent deep columns force, within one gated group, lanes with
    2+ deep cells — exercising the narrow first-deep full fetch AND the
    processed-prefix cap + rewind (resume at the second deep cell)."""
    from cpuvox_tpu.render.device import INLINE_MAX_RUNS

    dims = (64, 64, 64)
    xzs, ys = [], []
    # deep band: x in [28, 36), all z — every column ~8 runs (alternating
    # 4-voxel blocks), so rays crossing the band see consecutive deep cells
    for x in range(28, 36):
        for z in range(0, 64, 1):
            yy = np.concatenate([np.arange(0, 32, 8) + o for o in (0, 2)])
            xzs.append(np.full(yy.shape[0], x * dims[2] + z))
            ys.append(yy)
    # lite floor everywhere else
    xg, zg = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    keep = (xg < 28) | (xg >= 36)
    xzs.append((xg * dims[2] + zg)[keep].ravel())
    ys.append(np.zeros(keep.sum(), np.int64))
    xz = np.concatenate(xzs)
    y = np.concatenate(ys)
    rgb = tuple((37 * (xz + y * (3 + i)) % 255).astype(np.uint8)
                for i in range(3))
    w = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
    mr = int(np.asarray(w.col_runs).max())
    assert 8 < mr <= INLINE_MAX_RUNS, mr
    lods = rle.build_lod_chain(w, 6)
    # pitch +18 marches downward; -25 flips iteration_direction, exercising
    # the reversed-table lite decode (fwd color index reconstructed from the
    # column total_solid in lite slot 0 — a truncated prefix has no grand sum)
    cams = [cm.Camera(position=(4.0, 20.0, 4.0), pitch_deg=18.0, yaw_deg=40.0,
                      screen=SCREEN),
            cm.Camera(position=(4.0, 26.0, 4.0), pitch_deg=-25.0, yaw_deg=40.0,
                      screen=SCREEN)]
    for cam in cams:
        outs = {}
        for backend in ("xla", "pallas"):
            cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1],
                               chunk_steps=32, max_march_chunks=64,
                               backend=backend, pallas_interpret=True,
                               occupancy_gate="on", lite_records="auto")
            r = Renderer.create(lods, cfg)
            if backend == "pallas":
                dw = r.device_world
                assert dw.lite_fwd is not None and 0 < dw.lite_runs < mr, \
                    (dw.lite_runs, mr)
                assert r.lite_runs_resolved == dw.lite_runs
            outs[backend] = r.render(cam, return_raybuffers=True)
        xs, (xtd, xlr, *_) = outs["xla"]
        ps, (ptd, plr, *_) = outs["pallas"]
        assert np.array_equal(xtd, ptd)
        assert np.array_equal(xlr, plr)
        assert np.array_equal(xs, ps)


def test_pallas_occupancy_argb_matches_xla():
    """Occupancy gate composed with ARGB record mode."""
    w = scenes.random_world(n=300, seed=5)
    cam = cm.Camera(position=(8, 10, 8), pitch_deg=25.0, yaw_deg=70.0,
                    screen=SCREEN)
    cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                       max_march_chunks=64, backend="pallas",
                       pallas_interpret=True, argb_records=True,
                       occupancy_gate="on")
    cfg_ref = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                           max_march_chunks=64, backend="xla")
    ra = Renderer.create([w] * 6, cfg)
    assert ra.device_world.max_col_colors > 0
    assert ra.occupancy_on
    assert np.array_equal(ra.render(cam),
                          Renderer.create([w] * 6, cfg_ref).render(cam))


def test_pallas_argb_records_matches_xla():
    """Opt-in ARGB record mode (inline colors, phase 1 writes final pixels)
    must render identically to the index+resolve path."""
    w = scenes.random_world(n=300, seed=5)
    cam = cm.Camera(position=(8, 10, 8), pitch_deg=25.0, yaw_deg=70.0,
                    screen=SCREEN)
    cfg_argb = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                            max_march_chunks=64, backend="pallas",
                            pallas_interpret=True, argb_records=True)
    cfg_ref = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                           max_march_chunks=64, backend="xla")
    ra = Renderer.create([w] * 6, cfg_argb)
    assert ra.device_world.max_col_colors > 0, "ARGB mode did not engage"
    sa = ra.render(cam)
    sr = Renderer.create([w] * 6, cfg_ref).render(cam)
    assert np.array_equal(sa, sr)


def test_pallas_block_fetch_on_off_identical():
    """Block-conditional gated fetch (scan over 128-lane blocks, lax.cond
    skipping all-empty blocks) must be bit-identical to the full-width fetch —
    on a sparse scene where many blocks ARE skipped, in both iteration
    directions, including the lite-record path."""
    w = scenes.random_world(n=300, seed=5)
    lods = [w] * 6  # 16^3 scene: too small for a real 6-level chain
    for pitch in (25.0, -60.0):
        cam = cm.Camera(position=(8, 10, 8), pitch_deg=pitch, yaw_deg=70.0,
                        screen=SCREEN)
        outs = {}
        for bf in ("on", "off"):
            cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1],
                               chunk_steps=8, max_march_chunks=64,
                               backend="pallas", pallas_interpret=True,
                               occupancy_gate="on", block_fetch=bf,
                               lite_records="auto")
            r = Renderer.create(lods, cfg)
            outs[bf] = r.render(cam, return_raybuffers=True)
        s_on, (td_on, lr_on, *_) = outs["on"]
        s_off, (td_off, lr_off, *_) = outs["off"]
        assert np.array_equal(td_on, td_off), f"pitch {pitch}"
        assert np.array_equal(lr_on, lr_off), f"pitch {pitch}"
        assert np.array_equal(s_on, s_off), f"pitch {pitch}"


def test_pallas_run_block_sizes_identical():
    """kernel_run_block (runs swept per merged tile walk) is a pure perf knob:
    4 (default) / 8 / 3 (non-dividing) must render bit-identically on a
    deep-RLE world whose columns exceed every block size."""
    w = scenes.random_world(n=300, seed=11)
    lods = [w] * 6
    cam = cm.Camera(position=(8, 10, 8), pitch_deg=30.0, yaw_deg=50.0,
                    screen=SCREEN)
    outs = {}
    for rb in (4, 8, 3):
        cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                           max_march_chunks=64, backend="pallas",
                           pallas_interpret=True, kernel_run_block=rb,
                           occupancy_gate="on")
        r = Renderer.create(lods, cfg)
        assert r.device_world.max_runs > 8  # deep enough to exercise blocks
        outs[rb] = r.render(cam)
    assert np.array_equal(outs[4], outs[8])
    assert np.array_equal(outs[4], outs[3])


@pytest.mark.parametrize("knob", [{"kernel_slot_gate": "on"},
                                  {"kernel_walk_tile": 16},
                                  {"kernel_walk_tile": 32},
                                  {"kernel_walk_cond": "off"}])
def test_pallas_walk_knobs_identical(knob):
    """kernel_slot_gate (skip a walk slot's side-span uv math for tiles it
    does not cover) and kernel_walk_tile (16-sublane walk tiles) are pure
    perf knobs: bit-identical to defaults on a deep-RLE world (multi-block
    sweeps) and a sparse world, both pitches."""
    for w, pos in ((scenes.random_world(n=300, seed=11), (8, 10, 8)),
                   (scenes.tower_world(x=8, z=12, height=10), (8.5, 5, 2))):
        lods = [w] * 6
        for pitch in (30.0, -60.0):
            cam = cm.Camera(position=pos, pitch_deg=pitch, yaw_deg=50.0,
                            screen=SCREEN)
            outs = []
            for ov in ({}, knob):
                cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1],
                                   chunk_steps=8, max_march_chunks=64,
                                   backend="pallas", pallas_interpret=True,
                                   occupancy_gate="on", **ov)
                r = Renderer.create(lods, cfg)
                outs.append(r.render(cam))
            assert np.array_equal(outs[0], outs[1]), (knob, pitch)


def test_pallas_roll_engages_on_frame_path(capsys):
    """kernel_roll='on' must ACTUALLY run ops/roll_kernel on the frame path
    and stay output-identical.  Regression for the r5 discovery that the
    (10,)-padded frame lod_distances tripped the roll's NLD > 7 fallback on
    every frame — the early 'roll A/Bs' timed two identical scan programs.
    frame.py now slices the padded table to the reachable 7 entries; the
    loud-fallback warning (ADVICE r4) is what this test listens for."""
    from cpuvox_tpu.render import raymarch as rm

    w = scenes.random_world(n=300, seed=11)
    lods = [w] * 6
    cam = cm.Camera(position=(8, 10, 8), pitch_deg=30.0, yaw_deg=50.0,
                    screen=SCREEN)
    outs = []
    rm._roll_chunk_pallas._warned = False
    for roll in ("off", "on"):
        cfg = RenderConfig(width=SCREEN[0], height=SCREEN[1], chunk_steps=8,
                           max_march_chunks=64, backend="pallas",
                           pallas_interpret=True, occupancy_gate="on",
                           kernel_roll=roll)
        outs.append(Renderer.create(lods, cfg).render(cam))
    assert np.array_equal(outs[0], outs[1])
    assert "fell back to the scan roll" not in capsys.readouterr().err


def test_pallas_roll_bit_equals_scan_roll():
    """ops/roll_kernel (one Pallas program per chunk roll) must reproduce
    _roll_chunk's visit list and carry-out BIT-identically — every op in the
    roll is exact or unambiguously rounded (no a*b+c shapes), so any
    difference is a kernel bug.  Adversarial state: axis-parallel rays
    (inf tdelta), out-of-bounds positions, dead lanes, mixed LODs."""
    import jax
    import jax.numpy as jnp

    from cpuvox_tpu.render import raymarch as rm

    rng = np.random.default_rng(3)
    R = 256
    pos = rng.integers(-4, 60, size=(R, 2)).astype(np.int32)
    dirs = rng.normal(size=(R, 2)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True).astype(np.float32)
    dirs[:8, 0] = 0.0
    with np.errstate(divide="ignore"):
        tdelta = np.abs(1.0 / dirs).astype(np.float32)
    tmax = (rng.random((R, 2)).astype(np.float32) * tdelta).astype(np.float32)
    tmax = np.where(np.isfinite(tmax), tmax, np.float32(1e30)).astype(
        np.float32)
    dda = rm.DDAState(
        pos=jnp.asarray(pos), tmax=jnp.asarray(tmax),
        tdelta=jnp.asarray(tdelta),
        stp=jnp.asarray(np.where(dirs >= 0, 1, -1).astype(np.int32)),
        ids=jnp.asarray(np.sort(
            rng.random((R, 2)).astype(np.float32) * 3.0, axis=1)),
        lod=jnp.asarray(rng.integers(0, 3, size=R).astype(np.int32)))
    ld = jnp.asarray(np.array([2., 5., 9., 14., 20., 27.], np.float32))
    args = (jnp.asarray(rng.random(R) < 0.9), jnp.asarray(dirs), ld,
            jnp.float32(40.0), (64, 16, 64), 16)
    a = rm._roll_chunk(dda, *args)
    b = rm._roll_chunk_pallas(dda, *args, interpret=True)

    def bits(x):
        x = np.asarray(x)
        return x.view(np.int32) if x.dtype == np.float32 else x

    for xa, ya in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        assert np.array_equal(bits(xa), bits(ya))


def test_gated_auto_march_budget_guarantees_no_truncation():
    """The auto march budget on the GATED path must be 3*max_dim + 64: every
    gated iteration provably advances >= 1 rasterized cell or >= chunk DDA
    steps, so that bound makes ANY stop/rewind rate output-exact — unused
    while_loop iterations cost nothing.  The round-3 policy (3*max_dim/chunk
    + 64 'rewind headroom') was NOT a guarantee: adaptive-lite stops at
    mill/1080p scale exhausted it and silently truncated tail rays, which was
    the actual root cause of the ~5000-px lite-vs-XLA divergence (PERF_NOTES
    finding 26)."""
    w = scenes.random_world(n=300, seed=5)  # empty-majority: gate auto-engages
    lods = [w] * 6
    cfg = RenderConfig(width=32, height=24, backend="pallas",
                       pallas_interpret=True, occupancy_gate="on")
    r = Renderer.create(lods, cfg)
    assert r.occupancy_on
    chunk, mc = r.march_params
    assert mc >= 3 * max(r.device_world.dims) + 64, (chunk, mc)
    # the dense path has no rewind: per-chunk provisioning is kept
    cfg_d = RenderConfig(width=32, height=24, backend="pallas",
                         pallas_interpret=True, occupancy_gate="off")
    rd = Renderer.create(lods, cfg_d)
    chunk_d, mc_d = rd.march_params
    assert mc_d == (3 * max(rd.device_world.dims)) // chunk_d + 64
