"""Full-frame render orchestration (the RenderManager.DrawWorld equivalent,
RenderManager.cs:111-194).

Host work per frame is only the tiny VP/segment geometry (a few hundred bytes of
FrameParams); ray setup, the phase-1 march, color resolve and phase-2 reprojection all
run as ONE fused jitted device program — there is no per-frame bulk host<->device
traffic (the reference's per-frame texture upload, RayBuffer.cs:91-96, has no
equivalent here by design; see SURVEY.md §2 parallelism table).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.utils.colors import pack_argb
from cpuvox_tpu.world.rle import WorldLOD

from . import camera as cm
from . import device_init, raymarch, reproject
from . import segments as sg
from .device import DeviceWorld, build_device_world

F = np.float32


@functools.partial(
    jax.jit,
    static_argnames=("backend", "interpret", "iteration_direction", "chunk",
                     "max_chunks", "max_runs", "dims", "pixel_len", "width",
                     "height", "R", "out_width", "out_height",
                     "max_col_colors", "skybox_argb", "occupancy",
                     "gated_cells", "lite_runs", "block_fetch", "rb_cap",
                     "drain_groups", "solid_min_y", "solid_max_y",
                     "sweep_skip", "slot_gate", "walk_tile", "walk_cond",
                     "roll_pallas"))
def _frame_fn(wa, fp, tri_a, tri_b, tri_c, ray_count, ray_base, active,
              backend, interpret, iteration_direction, chunk, max_chunks,
              max_runs, dims, pixel_len, width, height, R,
              out_width=None, out_height=None, init=None,
              max_col_colors=0, skybox_argb=0xFF191919, occupancy=False,
              gated_cells=0, lite_runs=0, block_fetch=True, rb_cap=4,
              drain_groups=0, solid_min_y=None, solid_max_y=None,
              sweep_skip=True, slot_gate=False, walk_tile=8, walk_cond=True,
              roll_pallas=False):
    if init is None:
        static, dda, alive0 = device_init.init_rays_device(fp, dims, R)
    else:
        static, dda, alive0 = init  # host-built (bit-exact vs the oracle)
    common = dict(iteration_direction=iteration_direction, chunk=chunk,
                  max_chunks=max_chunks, max_runs=max_runs, dims=dims,
                  pixel_len=pixel_len)
    argb_mode = backend == "pallas" and max_col_colors > 0
    if backend == "pallas":
        # the (10,)-padded lod_distances (device_init builds 10 entries; the
        # pad is +inf) silently disabled the Pallas roll kernel: its NLD > 7
        # fallback fired on EVERY frame (found r5 — the r4 roll "A/B" timed
        # two identical scan-roll programs).  Entries >= lod_levels are +inf
        # and unreachable by live lanes (a live ray's interval distance is
        # < 2*far_clip = distances[lod_levels-1], and dead lanes never
        # advance), so the leading 7 entries are the whole reachable table
        # whenever lod_levels <= 7 — roll_pallas is only resolved on under
        # that condition (frame wiring below)
        ld_roll = fp.lod_distances[:7] if roll_pallas else fp.lod_distances
        raybuf_idx = raymarch.phase1_pallas(
            wa, static, dda, alive0, ld_roll, fp.far_clip,
            float(dims[1]), fp.cam_pos[1], **common, interpret=interpret,
            max_col_colors=max_col_colors if argb_mode else 0,
            skybox_argb=skybox_argb, occupancy=occupancy,
            gated_cells=gated_cells, lite_runs=lite_runs,
            block_fetch=block_fetch, rb_cap=rb_cap,
            drain_groups=drain_groups,
            solid_min_y=solid_min_y, solid_max_y=solid_max_y,
            sweep_skip=sweep_skip, slot_gate=slot_gate, walk_tile=walk_tile,
            walk_cond=walk_cond, roll_pallas=roll_pallas)
    else:
        raybuf_idx = raymarch.phase1(
            wa, static, dda, alive0, fp.lod_distances, fp.far_clip,
            jnp.float32(dims[1]), fp.cam_pos[1], **common,
            solid_min_y=solid_min_y, solid_max_y=solid_max_y)
    if argb_mode:
        # phase 1 already wrote final ARGB — sample it and we're done (no
        # 2M-element color resolve; a flat ~75ms on v5e at 1080p)
        rb_bits = jax.lax.bitcast_convert_type(raybuf_idx, jnp.int32)
        screen_bits = reproject.reproject_pallas(
            rb_bits, tri_a, tri_b, tri_c, ray_count, ray_base, active,
            width=width, height=height,
            skybox=jax.lax.bitcast_convert_type(
                jnp.uint32(skybox_argb), jnp.int32),
            interpret=interpret)
        screen = jax.lax.bitcast_convert_type(screen_bits, jnp.uint32)
    else:
        # reproject in color-INDEX space first, then resolve only the screen's
        # pixels — resolving the whole raybuffer would be an ~18M-row gather
        if backend == "pallas":
            screen_idx = reproject.reproject_pallas(
                raybuf_idx, tri_a, tri_b, tri_c, ray_count, ray_base, active,
                width=width, height=height, skybox=jnp.int32(0),
                interpret=interpret)
        else:
            screen_idx = reproject.reproject.__wrapped__(
                raybuf_idx, tri_a, tri_b, tri_c, ray_count, ray_base, active,
                width=width, height=height, skybox=jnp.int32(0))
        # FLAT resolve: the band-conditional variant (resolve_colors_banded,
        # skip all-sky 8-row bands) models a win but measured +36 ms p50 on
        # TPU at 36% sky (perf/ab_resolve_banded, r4) — ~135 per-band
        # cond+gather launches cost more than the skipped rows save, the same
        # per-launch-overhead lesson as the block-conditional fetch
        # (PERF_NOTES 25/28).  The banded variant stays available + equality-
        # tested for future hardware.
        screen = raymarch.resolve_colors(screen_idx, wa.colors)
    if out_width is not None and (out_width, out_height) != (width, height):
        # native-size upscale of the scaled render (the reference renders through
        # a low-res "fake camera" and lets the GPU blit stretch it,
        # UnityManager.cs:57-63,179-182; nearest sampling like the blit shader)
        ys = (jnp.arange(out_height, dtype=jnp.int32) * height) // out_height
        xs = (jnp.arange(out_width, dtype=jnp.int32) * width) // out_width
        screen = screen[ys][:, xs]
    return screen, raybuf_idx


@dataclasses.dataclass
class Renderer:
    """Holds the device world + cached jit state; render frames via render()."""

    device_world: DeviceWorld
    config: RenderConfig
    lod_distances: np.ndarray | None = None
    far_clip: float = 0.0
    _wa: raymarch.WorldArrays | None = None

    @classmethod
    def create(cls, lods: list[WorldLOD], config: RenderConfig = RenderConfig()):
        dw = build_device_world(lods, skybox_rgb=config.skybox_rgb,
                                inline_colors=config.argb_records)
        r = cls(device_world=dw, config=config)
        r._wa = raymarch.world_arrays(dw)
        return r

    @property
    def render_wh(self) -> tuple[int, int]:
        """Internal phase-1/2 resolution — the reference's scaled "fake camera"
        (UnityManager.cs:35-36,57-63); output is upscaled to (width, height)."""
        cfg = self.config
        return (max(2, int(round(cfg.width * cfg.render_scale))),
                max(2, int(round(cfg.height * cfg.render_scale))))

    @property
    def occupancy_on(self) -> bool:
        """Resolve the occupancy-gate policy against the world's content (the
        gate only wins when empty columns dominate — see RenderConfig)."""
        dw = self.device_world
        if (self.config.backend != "pallas"
                or getattr(dw, "occ_tiles", None) is None):
            return False
        mode = self.config.occupancy_gate
        if mode == "on":
            return True
        if mode == "off":
            return False
        return getattr(dw, "empty_frac", 0.0) >= 0.5

    @property
    def lite_runs_resolved(self) -> int:
        """Adaptive lite tier, or 0 when disabled (RenderConfig.lite_records)."""
        if getattr(self.config, "lite_records", "auto") == "off":
            return 0
        return self.device_world.lite_runs

    @property
    def block_fetch_on(self) -> bool:
        """Resolve the block-conditional-fetch policy.  "auto" resolves to
        OFF: the paired on-TPU A/B measured the block-conditional scan +456 ms
        p50 on mill1024 (cond-launch overhead swamps the slot savings — see
        RenderConfig.block_fetch)."""
        mode = getattr(self.config, "block_fetch", "auto")
        return mode == "on"

    @property
    def solid_bounds(self) -> tuple[float | None, float | None]:
        """(solid_min_y, solid_max_y) for the solid-bound ray kill, or
        (None, None) when disabled (RenderConfig.solid_kill)."""
        if getattr(self.config, "solid_kill", "on") == "off":
            return (None, None)
        dw = self.device_world
        lo = getattr(dw, "solid_min_y", None)
        hi = getattr(dw, "solid_max_y", None)
        if lo is None or hi is None:
            return (None, None)
        return (lo, hi)

    @property
    def march_params(self) -> tuple[int, int]:
        """Resolve (chunk_steps, max_march_chunks), applying the 0=auto policy:
        occupancy-gated large worlds march in big chunks (the gated fetch pays
        a fixed GK x rays slot budget per chunk, so bigger chunks raise slot
        utilization — measured sweep in PERF_NOTES #19); dense or tiny worlds
        keep chunk 32.  Auto max_chunks covers a 3*max_dim-step march (the
        round-2/3 bench provisioning, validated vs the oracle on mill content);
        on the GATED path it must also cover the busy-ray rewind: every gated
        iteration provably advances >= 1 cell or >= chunk steps, so
        3*max_dim + 64 iterations can never truncate a ray — and unused
        while_loop iterations cost nothing (the loop exits when rays die).
        The round-3 '+64 rewind headroom' was NOT a guarantee: lite-record
        stops at mill/1080p scale exhausted it and silently truncated tail
        rays (~5000 px vs the XLA reference — PERF_NOTES finding 26's actual
        root cause)."""
        cfg = self.config
        max_dim = max(self.device_world.dims)
        chunk = cfg.chunk_steps
        if chunk == 0:
            chunk = 128 if (self.occupancy_on and max_dim >= 512) else 32
        max_chunks = cfg.max_march_chunks
        if max_chunks == 0:
            if self.occupancy_on:
                max_chunks = 3 * max_dim + 64
            else:
                max_chunks = (3 * max_dim) // chunk + 64
        return chunk, max_chunks

    @property
    def ray_capacity(self) -> int:
        """Fixed worst-case padded ray count (RenderManager.cs:34-38 buffer sizing)
        so every camera pose shares one jit signature."""
        cfg = self.config
        w, h = self.render_wh
        quantum = 1024 if cfg.backend == "pallas" else 128
        return ((3 * (w + h) + quantum - 1) // quantum) * quantum

    def setup_camera(self, cam: cm.Camera) -> tuple[cm.Camera, cm.CameraData]:
        """Per-camera LOD distances + snapshot (UnityManager.LateUpdate semantics:
        horizon clamp :193-201, SetupLods :417-458)."""
        cfg = self.config
        cam = dataclasses.replace(cam, fov_y_deg=cfg.fov_y_deg, near=cfg.near_clip,
                                  screen=self.render_wh)
        cam = cm.limit_rotation_horizon(cam)
        if self.lod_distances is None:
            self.lod_distances, self.far_clip = cm.setup_lods(
                cam, max(self.device_world.dims), cfg.lod_levels, cfg.lod_error)
        cam_data = cm.make_camera_data(cam, self.lod_distances, self.far_clip)
        return cam, cam_data

    def render_device(self, cam: cm.Camera):
        """Render one frame fully on device.

        Returns (screen (H, W) uint32 device array, raybuf color-index array,
        frame geometry).
        """
        cfg = self.config
        rw, rh = self.render_wh
        cam, cam_data = self.setup_camera(cam)

        vp_world = cm.vanishing_point_world(cam)
        vp_screen = cm.vanishing_point_screen(cam, vp_world)
        segs = sg.build_segments(cam, vp_screen)
        ctxs = sg.build_segment_contexts(cam, segs, vp_screen)

        dims = self.device_world.dims
        R = self.ray_capacity
        n_rays = sum(s.ray_count for s in segs)
        if n_rays > R:
            raise ValueError(f"{n_rays} rays exceed capacity {R}")
        fp = device_init.build_frame_params(cam_data, segs, ctxs)

        n_td = segs[0].ray_count + segs[1].ray_count
        tables = reproject.reproject_tables(segs, ctxs, vp_screen, n_td)

        init = None
        if cfg.host_init:
            static, dda, alive0, _meta = raymarch.init_rays(
                cam_data, segs, ctxs, dims, fixed_size=R)
            init = (static, dda, alive0)

        walk_tile = getattr(cfg, "kernel_walk_tile", 0)
        if walk_tile == 0:
            # auto: 16-sublane walk tiles halve the Mosaic-control-bound walk
            # loop iterations — paired TPU A/Bs measured -60 ms p50 on
            # mill2048 (6-2 wins) and -141 ms on layered2048 (8-0), 0 px
            # diffs (perf/queue_out/ab_walk16_*, r5) — but LOSE +33 ms on
            # dense terrain2048 (3-5; its kernel is only ~28 ms and the
            # taller tile's extra vector work has too few iterations to
            # amortize), so auto gates on occupancy like the other deep-world
            # policies.  32 went -27 on mill2048 but +51 on layered2048
            # (ab_walk32_*): not escalated
            walk_tile = 16 if (self.occupancy_on
                               and max(rw, rh) % 16 == 0) else 8
        if walk_tile not in (8, 16, 32):
            # ADVICE r4: a mis-typed A/B leg must fail loudly, not silently
            # measure the default
            raise ValueError(f"kernel_walk_tile must be 0, 8, 16 or 32 "
                             f"(got {cfg.kernel_walk_tile})")
        interpret = cfg.pallas_interpret or jax.default_backend() == "cpu"
        screen, argb = _frame_fn(
            self._wa, fp,
            jnp.asarray(tables["tri_a"]), jnp.asarray(tables["tri_b"]),
            jnp.asarray(tables["tri_c"]), jnp.asarray(tables["ray_count"]),
            jnp.asarray(tables["ray_base"]), jnp.asarray(tables["active"]),
            backend=cfg.backend, interpret=interpret,
            iteration_direction=(
                -1 if cam_data.inverse_element_iteration_direction else 1),
            chunk=self.march_params[0], max_chunks=self.march_params[1],
            max_runs=self.device_world.max_runs, dims=dims,
            pixel_len=max(rw, rh), width=rw, height=rh, R=R,
            out_width=cfg.width, out_height=cfg.height, init=init,
            max_col_colors=self.device_world.max_col_colors,
            skybox_argb=int(pack_argb(*cfg.skybox_rgb)),
            occupancy=self.occupancy_on,
            gated_cells=cfg.gated_group_cells,
            lite_runs=self.lite_runs_resolved,
            block_fetch=self.block_fetch_on,
            rb_cap=cfg.kernel_run_block or (8 if self.occupancy_on else 4),
            drain_groups=getattr(cfg, "drain_groups", 0),
            solid_min_y=self.solid_bounds[0],
            solid_max_y=self.solid_bounds[1],
            sweep_skip=getattr(cfg, "kernel_sweep_skip", "on") != "off",
            slot_gate=getattr(cfg, "kernel_slot_gate", "off") == "on",
            walk_tile=walk_tile,
            walk_cond=(getattr(cfg, "kernel_walk_cond", "auto") == "on"
                       or (getattr(cfg, "kernel_walk_cond", "auto") == "auto"
                           and not self.occupancy_on)),
            roll_pallas=(getattr(cfg, "kernel_roll", "off") != "off"
                         and cfg.lod_levels <= 7))
        return screen, argb, (segs, ctxs, vp_screen, cam_data, cam)

    def render(self, cam: cm.Camera, return_raybuffers: bool = False):
        """Render one frame; returns (H, W) uint32 ARGB numpy (row 0 = bottom)."""
        screen, raybuf_idx, (segs, ctxs, vp_screen, cam_data, cam) = \
            self.render_device(cam)
        if return_raybuffers:
            cfg = self.config
            n_td = segs[0].ray_count + segs[1].ray_count
            n_lr = segs[2].ray_count + segs[3].ray_count
            if raybuf_idx.dtype == jnp.uint32:  # ARGB mode: already resolved
                argb_np = np.asarray(raybuf_idx)
            else:
                argb_np = np.asarray(
                    raymarch.resolve_colors(raybuf_idx, self._wa.colors))
            rw, rh = self.render_wh
            td = argb_np[:n_td, :rh]
            lr = argb_np[n_td:n_td + n_lr, :rw]
            return np.asarray(screen), (td, lr, segs, ctxs, vp_screen, cam_data,
                                        cam)
        return np.asarray(screen)


def render_frame(lods: list[WorldLOD], cam: cm.Camera,
                 config: RenderConfig = RenderConfig()):
    """One-shot convenience (builds the device world each call — use Renderer for
    interactive / benchmark loops)."""
    return Renderer.create(lods, config).render(cam)
