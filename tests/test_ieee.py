"""Correctly-rounded f32 divide/sqrt (utils/ieee.py) vs numpy ground truth.

On the CPU backend the hardware ops are already IEEE — so beyond plain
agreement, every case also SEEDS the ulp walk with estimates pushed up to
_WALK ulps off in both directions, proving the exact-sign midpoint machinery
(not the seed) produces the result.  TPU behavior (where seeds really are
wrong) is exercised by perf/check_device_init.py and the bench verify gate.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpuvox_tpu.utils import ieee


def _ulp_shift(x, k):
    """Shift positive finite f32 by k ulps via the int representation."""
    return (x.view(np.int32) + np.int32(k)).view(np.float32)


def _rand_f32(rng, n, lo_exp=-60, hi_exp=60):
    """Random finite f32 spread across binades (normal range)."""
    m = rng.uniform(1.0, 2.0, n).astype(np.float32)
    e = rng.integers(lo_exp, hi_exp, n).astype(np.float32)
    s = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return (s * m * (2.0 ** e)).astype(np.float32)


_ADVERSARIAL_DIV = [
    # (a, b) — exact quotients, power-of-two operands, near-tie mantissas
    (np.float32(1.0), np.float32(3.0)),
    (np.float32(2.0), np.float32(3.0)),
    (np.float32(1e8), np.float32(3.0)),
    (np.float32(1.0), np.float32(1.0)),          # exact
    (np.float32(6.0), np.float32(2.0)),          # exact
    (np.float32(1.5), np.float32(2.0 ** 20)),    # exact, power-of-two divisor
    (np.float32(np.pi), np.float32(np.e)),
    (np.float32(1.0 + 2 ** -23), np.float32(1.0 - 2 ** -23)),
    # a == m * b with 25-bit m: quotient exactly on a rounding midpoint
    (np.float32((2 ** 24 + 1) * 3.0), np.float32(3.0 * 2.0)),
    (np.float32((2 ** 24 + 3)) * np.float32(2.0 ** -30), np.float32(2.0)),
]


def test_div_rn_matches_numpy_random():
    rng = np.random.default_rng(7)
    a = _rand_f32(rng, 20000)
    b = _rand_f32(rng, 20000)
    want = (a / b).astype(np.float32)
    got = np.asarray(jax.jit(ieee.div_rn)(a, b))
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_div_rn_walk_converges_from_bad_seeds():
    rng = np.random.default_rng(8)
    a = _rand_f32(rng, 5000)
    b = _rand_f32(rng, 5000)
    want = (a / b).astype(np.float32)
    q_true = np.abs(want)
    for k in (-3, -1, 1, 3):
        seed = _ulp_shift(q_true, k)
        got = np.asarray(jax.jit(ieee.div_rn)(a, b, _seed=seed))
        np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


@pytest.mark.parametrize("a,b", _ADVERSARIAL_DIV)
def test_div_rn_adversarial(a, b):
    for sa in (a, -a):
        for sb in (b, -b):
            want = np.float32(sa) / np.float32(sb)
            q_true = np.abs(np.array([want]))
            for k in (-3, -2, -1, 0, 1, 2, 3):
                got = np.asarray(ieee.div_rn(
                    np.array([sa]), np.array([sb]),
                    _seed=_ulp_shift(q_true, k)))[0]
                assert got.view(np.int32) == want.view(np.int32), (
                    f"{sa}/{sb} seed {k} ulp: got {got!r} want {want!r}")


def test_div_rn_irregular_inputs_fall_back():
    a = np.array([0.0, -0.0, 1.0, np.inf, np.nan, 1.0], np.float32)
    b = np.array([2.0, 2.0, np.inf, 2.0, 1.0, 0.0], np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        want = (a / b).astype(np.float32)
    got = np.asarray(ieee.div_rn(a, b))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m].view(np.int32),
                                  want[m].view(np.int32))


def test_sqrt_rn_matches_numpy_random():
    rng = np.random.default_rng(9)
    x = np.abs(_rand_f32(rng, 20000, lo_exp=-120, hi_exp=120))
    want = np.sqrt(x).astype(np.float32)
    got = np.asarray(jax.jit(ieee.sqrt_rn)(x))
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_sqrt_rn_walk_converges_from_bad_seeds():
    rng = np.random.default_rng(10)
    x = np.abs(_rand_f32(rng, 5000, lo_exp=-120, hi_exp=120))
    want = np.sqrt(x).astype(np.float32)
    for k in (-3, -1, 1, 3):
        got = np.asarray(jax.jit(ieee.sqrt_rn)(x, _seed=_ulp_shift(want, k)))
        np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_sqrt_rn_adversarial():
    xs = np.array([1.0, 2.0, 4.0, 0.25, 3.0, 5.0, 2.0 ** -40, 2.0 ** 40,
                   1.0 + 2 ** -23, 2.0 - 2 ** -23, np.float32(np.pi)],
                  np.float32)
    want = np.sqrt(xs).astype(np.float32)
    for k in (-3, -2, -1, 0, 1, 2, 3):
        got = np.asarray(ieee.sqrt_rn(xs, _seed=_ulp_shift(want, k)))
        np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_sqrt_rn_irregular_inputs_fall_back():
    x = np.array([0.0, -0.0, np.inf, np.nan, -1.0], np.float32)
    with np.errstate(invalid="ignore"):
        want = np.sqrt(x).astype(np.float32)
    got = np.asarray(ieee.sqrt_rn(x))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m].view(np.int32),
                                  want[m].view(np.int32))
