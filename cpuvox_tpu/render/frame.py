"""Full-frame render orchestration (the RenderManager.DrawWorld equivalent,
RenderManager.cs:111-194): host-side VP/segment/camera setup, device phase-1 march,
color resolve, phase-2 reprojection."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.world.rle import WorldLOD

from . import camera as cm
from . import raymarch, reproject
from . import segments as sg
from .device import DeviceWorld, build_device_world

F = np.float32


@dataclasses.dataclass
class Renderer:
    """Holds the device world + cached jit state; render frames via render()."""

    device_world: DeviceWorld
    config: RenderConfig
    lod_distances: np.ndarray | None = None
    far_clip: float = 0.0
    _wa: raymarch.WorldArrays | None = None
    _colors: jnp.ndarray | None = None

    @classmethod
    def create(cls, lods: list[WorldLOD], config: RenderConfig = RenderConfig()):
        dw = build_device_world(lods)
        r = cls(device_world=dw, config=config)
        r._wa = raymarch.world_arrays(dw)
        r._colors = r._wa.colors
        return r

    def setup_camera(self, cam: cm.Camera) -> tuple[cm.Camera, cm.CameraData]:
        """Per-camera LOD distances + snapshot (UnityManager.LateUpdate semantics:
        horizon clamp :193-201, SetupLods :417-458)."""
        cfg = self.config
        cam = dataclasses.replace(cam, fov_y_deg=cfg.fov_y_deg, near=cfg.near_clip,
                                  screen=(cfg.width, cfg.height))
        cam = cm.limit_rotation_horizon(cam)
        if self.lod_distances is None:
            self.lod_distances, self.far_clip = cm.setup_lods(
                cam, max(self.device_world.dims), cfg.lod_levels, cfg.lod_error)
        cam_data = cm.make_camera_data(cam, self.lod_distances, self.far_clip)
        return cam, cam_data

    def render(self, cam: cm.Camera, return_raybuffers: bool = False):
        """Render one frame; returns (H, W) uint32 ARGB with row 0 = screen bottom."""
        cfg = self.config
        cam, cam_data = self.setup_camera(cam)

        vp_world = cm.vanishing_point_world(cam)
        vp_screen = cm.vanishing_point_screen(cam, vp_world)
        segs = sg.build_segments(cam, vp_screen)
        ctxs = sg.build_segment_contexts(cam, segs, vp_screen)

        dims = self.device_world.dims
        # fixed worst-case ray-count padding (RenderManager.cs:34-38 buffer sizing):
        # one jit signature for every camera pose; the pallas path blocks rays in
        # 8x128 groups
        quantum = 1024 if cfg.backend == "pallas" else 128
        r_max = ((3 * (cfg.width + cfg.height) + quantum - 1) // quantum) * quantum
        static, dda, alive0, meta = raymarch.init_rays(
            cam_data, segs, ctxs, dims, fixed_size=r_max)

        pixel_len = max(cfg.width, cfg.height)
        lod_distances = np.append(cam_data.lod_distances.astype(F),
                                  [np.float32(np.inf)] * 2)
        common = dict(
            iteration_direction=(
                -1 if cam_data.inverse_element_iteration_direction else 1),
            chunk=cfg.chunk_steps, max_chunks=cfg.max_march_chunks,
            max_runs=self.device_world.max_runs, dims=dims, pixel_len=pixel_len)
        args = (self._wa, static, dda, alive0,
                jnp.asarray(lod_distances), jnp.float32(cam_data.far_clip))
        cam_y = jnp.float32(cam_data.position_y)
        if cfg.backend == "pallas":
            interpret = cfg.pallas_interpret or jax.default_backend() == "cpu"
            raybuf_idx = raymarch.march_pallas_jit(
                *args, float(dims[1]), cam_y, **common,
                block_groups=cfg.block_groups, interpret=interpret)
        else:
            raybuf_idx = raymarch.march_jit(*args, jnp.float32(dims[1]), cam_y,
                                            **common)
        raybuf_argb = raymarch.resolve_colors(raybuf_idx, self._colors)

        n_td = segs[0].ray_count + segs[1].ray_count
        tables = reproject.reproject_tables(segs, ctxs, vp_screen, n_td)
        screen = reproject.reproject(
            raybuf_argb, jnp.asarray(tables["tri_a"]), jnp.asarray(tables["tri_b"]),
            jnp.asarray(tables["tri_c"]), jnp.asarray(tables["ray_count"]),
            jnp.asarray(tables["ray_base"]), jnp.asarray(tables["active"]),
            width=cfg.width, height=cfg.height)
        if return_raybuffers:
            n_lr = segs[2].ray_count + segs[3].ray_count
            td = np.asarray(raybuf_argb)[:n_td, :cfg.height]
            lr = np.asarray(raybuf_argb)[n_td:n_td + n_lr, :cfg.width]
            return np.asarray(screen), (td, lr, segs, ctxs, vp_screen, cam_data, cam)
        return np.asarray(screen)


def render_frame(lods: list[WorldLOD], cam: cm.Camera,
                 config: RenderConfig = RenderConfig()):
    """One-shot convenience (builds the device world each call — use Renderer for
    interactive / benchmark loops)."""
    return Renderer.create(lods, config).render(cam)
