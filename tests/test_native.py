"""Native C++ .obj parser vs the pure-python reference parser."""
import numpy as np
import pytest

from cpuvox_tpu.assets import native
from cpuvox_tpu.assets.obj import _import_obj_python, import_obj

MILL = "/root/reference/datasets/mill.obj"


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_mill_matches_python(have_native):
    a = import_obj(MILL, use_native=True)
    b = _import_obj_python(MILL)
    assert a.vertex_count == b.vertex_count
    np.testing.assert_allclose(a.positions, b.positions, rtol=1e-6, atol=1e-6)
    # colors may differ by 1 ulp of rounding; allow +-1
    assert np.max(np.abs(a.colors.astype(int) - b.colors.astype(int))) <= 1
    np.testing.assert_array_equal(a.material_index, b.material_index)


def test_negative_indices_and_quads(have_native, tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\n"
        "f -4/-3 -3/-2 -2/-1\n"
        "f 1 2 3 4\n")
    a = import_obj(str(p), use_native=True)
    b = _import_obj_python(str(p))
    assert a.vertex_count == b.vertex_count == 3 + 6
    np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
    np.testing.assert_allclose(a.uvs, b.uvs, atol=1e-6)


def test_swap_yz(have_native, tmp_path):
    p = tmp_path / "s.obj"
    p.write_text("v 1 2 3\nv 4 5 6\nv 7 8 9\nf 1 2 3\n")
    a = import_obj(str(p), swap_yz=True, use_native=True)
    np.testing.assert_allclose(a.positions[0], [1, 3, 2])


def test_speed_reasonable(have_native):
    import time

    t0 = time.perf_counter()
    import_obj(MILL, use_native=True)
    native_t = time.perf_counter() - t0
    assert native_t < 1.0  # 96 KB file; just a smoke bound
