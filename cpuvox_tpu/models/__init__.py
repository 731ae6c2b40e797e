from .procedural import heightmap_world, heightmap_lod0
