from .rle import WorldLOD, build_lod_from_voxels, downsample, get_column, validate_world
