from .mesh import RenderMesh, shard_ray_state
