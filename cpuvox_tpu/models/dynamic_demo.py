"""Dynamic terrain demo/bench model: per-frame height edits + on-device RLE rebuild
+ render in one jitted step (BASELINE.json config 4)."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.config import RenderConfig
from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world.dynamic import (SurfaceWorldSpec, animate_heights,
                                      build_surface_world_arrays,
                                      surface_renderer, terrain_colors)

F = np.float32


@dataclasses.dataclass
class DynamicTerrain:
    """Editable heightmap terrain rendered without any host round-trips.

    The static Renderer supplies the jit frame function; each frame we rebuild the
    world arrays from the current height field and substitute them.
    """

    spec: SurfaceWorldSpec
    renderer: Renderer
    base_top: jnp.ndarray  # (X, Z) int32

    @classmethod
    def create(cls, dims=(512, 128, 512), depth: int = 6, seed: int = 11,
               config: RenderConfig | None = None):
        from cpuvox_tpu.models.procedural import _fbm_heights

        X, Y, Z = dims
        # exact_lod1=False: the demo/bench uses the conservative-union LOD
        # chain (max_runs 3) — the configuration every dynamic512 round
        # record was measured with.  The voxel-exact LOD1 tier (r3) is
        # CORRECT (pixel-tested vs the static chain) but its max_runs=9
        # records currently stall the march's live-ray decay at demo scale:
        # 113 ms -> 2.4 s/frame at 720p, per-step cost ~30x, NOT in the
        # fetch/raster/sweep/roll (all ablations time identically), XLA twin
        # even slower — bisection data in ROUNDLOG r5; root cause open
        spec = SurfaceWorldSpec(dims=tuple(dims), depth=depth, lod_levels=6,
                                exact_lod1=False)
        h = _fbm_heights(X, Z, seed)
        base_top = np.clip((h * (Y * 0.5) + Y * 0.2).astype(np.int64), depth,
                           Y - 2)

        config = config or RenderConfig(width=640, height=360)
        # bootstrap a Renderer whose static world arrays have the same shapes
        top0 = jnp.asarray(base_top, jnp.int32)
        renderer = surface_renderer(spec, top0, terrain_colors(spec, top0),
                                    config)
        return cls(spec=spec, renderer=renderer, base_top=top0)

    def render_frame(self, t: float, cam: cm.Camera):
        """Rebuild (heights -> arrays) and render; everything on device."""
        top = animate_heights(self.spec, self.base_top, jnp.float32(t))
        self.renderer._wa = build_surface_world_arrays(
            self.spec, top, terrain_colors(self.spec, top))
        screen, _, _ = self.renderer.render_device(cam)
        return screen


