"""Batched multi-camera rendering — RL-environment rollout mode
(BASELINE.json config 5: "batched 64-camera 256x256 renders per step, one kernel
launch").

Because the march is ray-agnostic, a camera batch is simply MORE rays: every camera
contributes a fixed-capacity contiguous ray block, per-ray camera data (position,
projection planes) comes from the vmapped device init, and one phase-1 launch marches
all cameras' rays together.  Phase 2 reprojects per camera via vmap.  Cameras split
into at most two launches by march iteration direction (camera pitch sign — the
reference's two kernel specializations, DrawSegmentRayJob.cs:170-192).

Under a device mesh, sharding the ray axis shards whole cameras (blocks are
contiguous), giving data-parallel rollouts with zero communication until the final
(optional) gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render import device_init, raymarch, reproject
from cpuvox_tpu.render import segments as sg

F = np.float32

# jitted shard_map wrappers keyed by (mesh, statics, tree structures) — built
# once per signature so rollout steps hit the jit cache instead of retracing a
# fresh closure every call (the bucket padding above exists precisely to keep
# signatures stable across steps)
_SHARDED_CACHE: dict = {}


def _sharded_batch_fn(mesh, statics: tuple, wa_specs, fp_specs, cam_spec):
    key = (mesh, statics, jax.tree_util.tree_structure(wa_specs),
           jax.tree_util.tree_structure(fp_specs), cam_spec)
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        kw = dict(statics)

        def local(wa, fp_b, ta, tb_, tc, rc, rb, ac):
            return _batch_frame_fn.__wrapped__(
                wa, fp_b, ta, tb_, tc, rc, rb, ac, **kw)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(wa_specs, fp_specs) + (cam_spec,) * 6,
            out_specs=cam_spec, check_vma=False))
        _SHARDED_CACHE[key] = fn
    return fn


@functools.partial(
    jax.jit,
    static_argnames=("backend", "interpret", "iteration_direction", "chunk",
                     "max_chunks", "max_runs", "dims", "pixel_len", "width",
                     "height", "R1", "occupancy", "gated_cells", "lite_runs",
                     "solid_min_y", "solid_max_y"))
def _batch_frame_fn(wa, fp_b, tri_a, tri_b, tri_c, ray_count, ray_base, active,
                    backend, interpret, iteration_direction, chunk, max_chunks,
                    max_runs, dims, pixel_len, width, height, R1,
                    occupancy=False, gated_cells=0, lite_runs=0,
                    solid_min_y=None, solid_max_y=None):
    B = fp_b.cam_pos.shape[0]

    static_b, dda_b, alive_b = jax.vmap(
        lambda fp: device_init.init_rays_device(fp, dims, R1))(fp_b)

    flat = lambda x: x.reshape((B * R1,) + x.shape[2:])
    static = jax.tree_util.tree_map(flat, static_b)
    dda = jax.tree_util.tree_map(flat, dda_b)
    alive0 = flat(alive_b)
    cam_y = flat(jnp.broadcast_to(fp_b.cam_pos[:, 1:2], (B, R1)))

    common = dict(iteration_direction=iteration_direction, chunk=chunk,
                  max_chunks=max_chunks, max_runs=max_runs, dims=dims,
                  pixel_len=pixel_len)
    # lod distances / far clip are shared (same world + resolution for the batch)
    lodd = fp_b.lod_distances[0]
    farc = fp_b.far_clip[0]
    if backend == "pallas":
        raybuf_idx = raymarch.phase1_pallas(
            wa, static, dda, alive0, lodd, farc, float(dims[1]), cam_y,
            **common, interpret=interpret, occupancy=occupancy,
            gated_cells=gated_cells, lite_runs=lite_runs,
            solid_min_y=solid_min_y, solid_max_y=solid_max_y)
    else:
        raybuf_idx = raymarch.phase1(
            wa, static, dda, alive0, lodd, farc, jnp.float32(dims[1]), cam_y,
            **common, solid_min_y=solid_min_y, solid_max_y=solid_max_y)
    idx_b = raybuf_idx.reshape(B, R1, -1)
    screens_idx = jax.vmap(
        lambda a, ta, tb, tc, rc, rb, ac: reproject.reproject.__wrapped__(
            a, ta, tb, tc, rc, rb, ac, width=width, height=height,
            skybox=jnp.int32(0))
    )(idx_b, tri_a, tri_b, tri_c, ray_count, ray_base, active)
    return raymarch.resolve_colors(screens_idx, wa.colors)


def render_camera_batch(renderer, cams: list[cm.Camera], rmesh=None):
    """Render a batch of cameras in (at most two) launches.

    Returns a (B, H, W) uint32 device array in the input camera order.

    With ``rmesh`` (a parallel.mesh.RenderMesh), the camera axis is sharded over
    ALL mesh devices via shard_map: each chip renders its camera slice fully
    locally (phase 1 Pallas kernel included) with the world replicated — zero
    inter-chip communication, so this scales over DCN as well as ICI.  This is
    the multi-chip story for the Pallas path (GSPMD handles the XLA path; a
    pallas_call is not GSPMD-partitionable, shard_map is the idiomatic wrapper).
    """
    cfg = renderer.config
    dims = renderer.device_world.dims
    quantum = 1024 if cfg.backend == "pallas" else 128
    R1 = ((3 * (cfg.width + cfg.height) + quantum - 1) // quantum) * quantum

    prepared = []
    for i, cam in enumerate(cams):
        cam, cam_data = renderer.setup_camera(cam)
        vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
        segs = sg.build_segments(cam, vps)
        ctxs = sg.build_segment_contexts(cam, segs, vps)
        fp = device_init.build_frame_params(cam_data, segs, ctxs)
        n_td = segs[0].ray_count + segs[1].ray_count
        tables = reproject.reproject_tables(segs, ctxs, vps, n_td)
        direction = -1 if cam_data.inverse_element_iteration_direction else 1
        prepared.append((i, direction, fp, tables))

    H, W = cfg.height, cfg.width
    out = [None] * len(cams)
    for direction in (1, -1):
        group = [p for p in prepared if p[1] == direction]
        if not group:
            continue
        # pad the group to a bucket size so the jit signature is stable across
        # steps regardless of how cameras split by pitch sign (otherwise every
        # rollout step with a new split recompiles); dummy slots have zero rays
        # (seg_ray_count == 0 -> no alive rays, active == False -> skybox)
        n_real = len(group)
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        bucket = min(bucket, len(cams))
        if rmesh is not None:  # shard the camera axis evenly over the mesh
            n_dev = rmesh.mesh.devices.size
            bucket = max(bucket, n_dev)
            bucket = ((bucket + n_dev - 1) // n_dev) * n_dev
        n_pad = max(bucket, n_real) - n_real
        fp_b = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *(p[2] for p in group))
        tb = {k: jnp.asarray(np.stack([p[3][k] for p in group]))
              for k in ("tri_a", "tri_b", "tri_c", "ray_count", "ray_base",
                        "active")}
        if n_pad:
            fp_b = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)]), fp_b)
            tb = {k: jnp.concatenate(
                [v, jnp.zeros((n_pad,) + v.shape[1:], v.dtype)])
                for k, v in tb.items()}
        interpret = cfg.pallas_interpret or jax.default_backend() == "cpu"
        chunk, max_chunks = renderer.march_params
        statics = dict(
            backend=cfg.backend, interpret=interpret,
            iteration_direction=direction, chunk=chunk,
            max_chunks=max_chunks,
            max_runs=renderer.device_world.max_runs, dims=dims,
            pixel_len=max(W, H), width=W, height=H, R1=R1,
            occupancy=renderer.occupancy_on,
            gated_cells=cfg.gated_group_cells,
            lite_runs=renderer.lite_runs_resolved,
            solid_min_y=renderer.solid_bounds[0],
            solid_max_y=renderer.solid_bounds[1])
        args = (renderer._wa, fp_b, tb["tri_a"], tb["tri_b"], tb["tri_c"],
                tb["ray_count"], tb["ray_base"], tb["active"])
        if rmesh is None:
            screens = _batch_frame_fn(*args, **statics)
        else:
            from jax.sharding import PartitionSpec as P

            cam_spec = P(("cam", "rays"))  # all devices on the camera axis
            wa_specs = jax.tree_util.tree_map(lambda _: P(), renderer._wa)
            fp_specs = jax.tree_util.tree_map(lambda _: cam_spec, fp_b)
            sharded = _sharded_batch_fn(
                rmesh.mesh, tuple(sorted(statics.items())), wa_specs, fp_specs,
                cam_spec)
            screens = sharded(*args)
        for j, p in enumerate(group):  # dummy pad screens are dropped here
            out[p[0]] = screens[j]
    return jnp.stack(out)
