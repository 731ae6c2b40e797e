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
    """Run the phase-1 march with rays sharded and the world replicated.

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
