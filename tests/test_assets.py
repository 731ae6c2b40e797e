"""Asset pipeline tests: obj import, rescale, voxelizer (vs a slow per-triangle
transliteration of VoxelizerHelper.GetVoxelsInternal), and the mill.obj smoke test."""
import numpy as np
import pytest

from cpuvox_tpu.assets import import_obj, rescale, voxelize_mesh
from cpuvox_tpu.assets.mesh import SimpleMesh, next_power_of_two
from cpuvox_tpu.world import rle

MILL = "/root/reference/datasets/mill.obj"
F = np.float32


def make_mesh(tris, colors=None):
    """tris: (n, 3, 3) positions."""
    tris = np.asarray(tris, F).reshape(-1, 3)
    n = tris.shape[0]
    if colors is None:
        colors = np.full((n, 4), 255, np.uint8)
    return SimpleMesh(positions=tris, colors=np.asarray(colors, np.uint8),
                      uvs=np.zeros((n, 2), F), material_index=np.full(n, -1, np.int32))


def slow_voxelize_triangle(a, b, c, cols, dims):
    """Scalar transliteration of VoxelizerHelper.cs:28-132 for one triangle."""
    a, b, c = (np.asarray(v, F) for v in (a, b, c))
    out = []
    cr = np.cross(b - a, c - a)
    if np.dot(cr, cr) == 0:
        return out
    n = cr / np.sqrt(np.dot(cr, cr))
    mid = (a + b + c) / 3
    def dil(v):
        d = v - mid
        return v + d / np.sqrt(np.dot(d, d)) * 0.5
    a, b, c = dil(a), dil(b), dil(c)
    mn = np.clip(np.floor(np.minimum(a, np.minimum(b, c))), 0,
                 np.array(dims) - 1).astype(int)
    mx = np.clip(np.ceil(np.maximum(a, np.maximum(b, c))), 0,
                 np.array(dims) - 1).astype(int)
    for x in range(mn[0], mx[0] + 1):
        for z in range(mn[2], mx[2] + 1):
            for y in range(mn[1], mx[1] + 1):
                v = np.array([x, y, z], F) + 0.5
                d = np.dot(v - a, n)
                if abs(d) > 0.5:
                    continue
                p = v - n * d
                p0, p1, p2 = b - a, c - a, p - a
                d00, d01, d11 = np.dot(p0, p0), np.dot(p0, p1), np.dot(p1, p1)
                d20, d21 = np.dot(p2, p0), np.dot(p2, p1)
                denom = 1.0 / (d00 * d11 - d01 * d01)
                bv = (d11 * d20 - d01 * d21) * denom
                bw = (d00 * d21 - d01 * d20) * denom
                bu = 1.0 - bv - bw
                if any(t < 0 or t > 1 for t in (bu, bv, bw)):
                    continue
                col = (cols[0] * bu + cols[1] * bv + cols[2] * bw) / 255.0
                byte = tuple(int(np.clip(round(ch * 255.0), 0, 255)) for ch in col[:3])
                out.append((x * dims[2] + z, y, byte))
    return out


class TestNextPowerOfTwo:
    def test_values(self):
        assert [next_power_of_two(v) for v in (0, 1, 2, 3, 4, 5, 1000, 1024)] == \
            [0, 1, 2, 4, 4, 8, 1024, 1024]


class TestRescale:
    def test_fills_world(self):
        m = make_mesh([[[0, 0, 0], [10, 2, 0], [10, 2, 5]]])
        dims = rescale(m, 64, flips=(False, False, False))
        assert dims == (64, 16, 32)
        assert m.positions.min() >= 0
        assert m.positions[:, 0].max() == 64

    def test_flip_x(self):
        m = make_mesh([[[0, 0, 0], [10, 2, 0], [10, 2, 5]]])
        rescale(m, 64, flips=(True, False, False))
        assert m.positions[:, 0].min() == 0.0  # 64 - 64
        assert m.positions[:, 0].max() == 64.0  # 64 - 0


def test_device_voxelizer_matches_numpy_subprocess():
    """voxelize_mesh_device must produce the IDENTICAL voxel soup (values AND
    order) as the numpy path.  It needs process-global x64 (its keep-deciding
    reciprocal rounds through f64), which the test process must not enable —
    so the comparison runs in a child."""
    import os
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import numpy as np
from cpuvox_tpu.assets.obj import import_obj
from cpuvox_tpu.assets.mesh import rescale
from cpuvox_tpu.assets.voxelizer import voxelize_mesh, voxelize_mesh_device

mesh = import_obj("/root/reference/datasets/mill.obj")
rescale(mesh, 96)
a = voxelize_mesh(mesh, (96, 96, 96))
b = voxelize_mesh_device(mesh, (96, 96, 96), chunk_candidates=200_000)
assert a[0].shape == b[0].shape, (a[0].shape, b[0].shape)
assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
assert all(np.array_equal(x, y) for x, y in zip(a[2], b[2]))

# full pipeline: device soup + device LOD chain vs host chain, every field
from cpuvox_tpu.assets.pipeline import convert_obj_to_world
host = convert_obj_to_world("/root/reference/datasets/mill.obj",
                            max_dimension=96)
dev = convert_obj_to_world("/root/reference/datasets/mill.obj",
                           max_dimension=96, device=True)
fields = ("col_offset", "col_runs", "col_color_offset", "col_min", "col_max",
          "runs", "colors")
for L, (h, d) in enumerate(zip(host, dev)):
    for f in fields:
        assert np.array_equal(getattr(h, f), getattr(d, f)), (L, f)
print("device voxelizer identical:", a[0].shape[0], "voxels; chain identical")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    proc = subprocess.run([sys.executable, "-c", code.format(repo=repo)],
                          env=env, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "identical" in proc.stdout


class TestVoxelizer:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_slow_reference(self, seed):
        rng = np.random.default_rng(seed)
        dims = (32, 32, 32)
        n_tris = 20
        tris = rng.uniform(2, 29, size=(n_tris, 3, 3)).astype(F)
        cols = rng.integers(0, 256, size=(n_tris * 3, 4)).astype(np.uint8)
        cols[:, 3] = 255
        m = make_mesh(tris, cols)
        xz, y, (r, g, b) = voxelize_mesh(m, dims)
        got = sorted(zip(xz.tolist(), y.tolist(),
                         zip(r.tolist(), g.tolist(), b.tolist())))
        exp = []
        for t in range(n_tris):
            exp += slow_voxelize_triangle(tris[t, 0], tris[t, 1], tris[t, 2],
                                          cols[3 * t: 3 * t + 3].astype(F), dims)
        exp = sorted((xzi, yi, c) for xzi, yi, c in exp)
        assert len(got) == len(exp)
        for (gxz, gy, gc), (exz, ey, ec) in zip(got, exp):
            assert (gxz, gy) == (exz, ey)
            assert all(abs(int(x) - int(y)) <= 1 for x, y in zip(gc, ec))

    def test_flat_quad_coverage(self):
        # a flat y=4.5-plane square must produce a filled patch of voxels at y=4
        dims = (16, 16, 16)
        quad = [
            [[2, 4.5, 2], [13, 4.5, 2], [13, 4.5, 13]],
            [[2, 4.5, 2], [13, 4.5, 13], [2, 4.5, 13]],
        ]
        m = make_mesh(quad)
        xz, y, _ = voxelize_mesh(m, dims)
        assert np.all(y == 4)
        cells = set(zip((xz // 16).tolist(), (xz % 16).tolist()))
        for x in range(3, 13):
            for z in range(3, 13):
                assert (x, z) in cells

    def test_degenerate_triangle_skipped(self):
        m = make_mesh([[[1, 1, 1], [1, 1, 1], [1, 1, 1]]])
        xz, y, _ = voxelize_mesh(m, (8, 8, 8))
        assert xz.shape[0] == 0


class TestObjImport:
    def test_mill_parses(self):
        mesh = import_obj(MILL)
        assert mesh.triangle_count == 2024
        # vertex colors present (mill has 6-component v lines)
        assert not np.all(mesh.colors[:, :3] == 255)

    def test_mill_to_world_smoke(self):
        mesh = import_obj(MILL)
        dims = rescale(mesh, 128)
        assert max(dims) == 128
        xz, y, rgb = voxelize_mesh(mesh, dims)
        assert xz.shape[0] > 1000
        w = rle.build_lod_from_voxels(dims, 0, xz, y, rgb)
        rle.validate_world(w)
        assert w.voxel_count > 1000
        w1 = rle.downsample(w, 1)
        rle.validate_world(w1)
        assert 0 < w1.voxel_count < w.voxel_count

    def test_negative_indices(self, tmp_path):
        p = tmp_path / "neg.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        mesh = import_obj(str(p))
        assert mesh.triangle_count == 1
        np.testing.assert_allclose(mesh.positions[1], [1, 0, 0])

    def test_quad_fan(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        mesh = import_obj(str(p))
        assert mesh.triangle_count == 2
