"""Round-trip tests for the `.world` binary format."""
import numpy as np
import pytest

from cpuvox_tpu.world import rle
from cpuvox_tpu.world.save import load_world, save_world


def make_chain(seed=0, dims=(16, 16, 16), n=200, levels=3):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, dims[0], n)
    y = rng.integers(0, dims[1], n)
    z = rng.integers(0, dims[2], n)
    rgb = tuple(rng.integers(0, 256, n).astype(np.uint8) for _ in range(3))
    xz = x * dims[2] + z
    w0 = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
    return rle.build_lod_chain(w0, levels)


def test_roundtrip(tmp_path):
    chain = make_chain()
    p = str(tmp_path / "t.world")
    save_world(p, chain)
    loaded = load_world(p)
    assert len(loaded) == len(chain)
    for a, b in zip(chain, loaded):
        assert a.dims == b.dims and a.lod == b.lod
        for field in ("col_offset", "col_runs", "col_color_offset", "col_min",
                      "col_max", "runs", "colors"):
            np.testing.assert_array_equal(getattr(a, field), getattr(b, field))
        rle.validate_world(b)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.world"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a cpuvox_tpu"):
        load_world(str(p))
