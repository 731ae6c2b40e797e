"""Correctly-rounded (IEEE RN) float32 divide and sqrt built from f32 mul/add.

TPU hardware f32 divide and sqrt are NOT IEEE round-to-nearest (~35% of divides
and ~38% of sqrts differ from numpy by an ulp — PERF_NOTES.md finding 8), which
is the one remaining blocker for bit-exact on-device per-frame ray init
(device_init.py vs the numpy/oracle semantics of DrawSegmentRayJob.cs:49-143).
f64 routing fixes it but needs process-global jax_enable_x64, which the render
process must not flip (int dtype defaults would change under the hot path).

This module instead computes RN(a/b) and RN(sqrt(x)) exactly, in pure f32:

  1. take the hardware estimate q (a few ulps off at worst);
  2. walk q up/down by ulps, deciding each move with the EXACT sign of
     ``a - m*b`` (resp. ``x - m*m``) at the rounding midpoint m between
     neighbouring floats.  The sign tests use Dekker/Veltkamp two-products
     (exact without FMA: 12+12-bit mantissa splits make every partial product
     exact) plus Knuth two-sums, and a final descending-order compensated
     cascade whose rounded head has the sign of the exact sum (RN is monotone
     and sign-preserving, so the sign of a rounded difference is the sign of
     the exact difference).
  3. exact midpoint hits (true quotient exactly representable with 25 bits)
     resolve to the even-mantissa neighbour, matching RN ties-to-even.

Domain notes (asserted by the call sites, tested in tests/test_ieee.py):
  - normal, finite inputs whose quotient/root neither overflows nor goes
    subnormal — the renderer's init math (directions, plane distances, t
    parameters) lives in [2^-64, 2^64];
  - TPU f32 multiply/add ARE correctly rounded (only divide/sqrt/rsqrt and
    transcendentals are approximate), which everything here relies on;
  - XLA may contract ``a*b + c`` into an FMA: every contraction site in the
    two-product error expression only makes the partial term MORE exact (the
    fma computes the same exact value the Dekker partials reconstruct), so
    correctness is contraction-agnostic.  No reassociation is assumed anywhere.

Cost: ~200 vector f32 ops per divide — irrelevant at ray-init scale (a few
thousand lanes, once per frame), never used in the per-cell march hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLIT_C = jnp.float32(4097.0)  # 2^12 + 1: Veltkamp split point for 24-bit f32

# ulp-walk width: hardware estimates are ~1 ulp off (rarely 2); 3 covers it
# with margin, and tests/test_ieee.py seeds the walk with estimates pushed a
# full 3 ulps off to prove the walk converges from anywhere in range.
_WALK = 3


def _two_sum(x, y):
    """Knuth two-sum: s + e == x + y exactly, s = RN(x + y). 6 ops, no
    magnitude precondition."""
    s = x + y
    b = s - x
    e = (x - (s - b)) + (y - b)
    return s, e


def _split(x):
    """Veltkamp split: x == hi + lo with hi/lo having <= 12 significant bits
    each (so hi*hi, hi*lo, lo*lo products are exact in f32)."""
    c = _SPLIT_C * x
    hi = c - (c - x)
    return hi, x - hi


def _two_prod(x, y):
    """Dekker two-product: p + e == x * y exactly (no FMA needed)."""
    p = x * y
    xh, xl = _split(x)
    yh, yl = _split(y)
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, e


def _sign_sum3(a, b, c):
    """Exact sign of a + b + c (each f32, no over/underflow): returns a float
    with the sign of the exact sum (0 iff the exact sum is 0).

    Shewchuk expansion arithmetic (the construction behind robust geometric
    predicates): two_sum produces a nonoverlapping expansion [e, s]; growing
    it by a scalar from the smallest component up keeps the components
    nonoverlapping and magnitude-ordered, so the largest nonzero component
    strictly dominates the sum of the rest and carries the exact sign."""
    s, e = _two_sum(b, c)
    q1, h1 = _two_sum(a, e)
    q2, h2 = _two_sum(q1, s)
    # exact sum == h1 + h2 + q2, nonoverlapping, |h1| < |h2| < |q2| when nonzero
    return jnp.where(q2 != 0, q2, jnp.where(h2 != 0, h2, h1))


def _sign_sum4(a, b, c, d):
    """Exact sign of a + b + c + d (same construction as _sign_sum3)."""
    s, e = _two_sum(c, d)
    q1, h1 = _two_sum(b, e)
    q2, h2 = _two_sum(q1, s)
    # expansion [h1, h2, q2] == b + c + d; grow by a from the smallest up
    t1, g1 = _two_sum(a, h1)
    t2, g2 = _two_sum(t1, h2)
    t3, g3 = _two_sum(t2, q2)
    return jnp.where(
        t3 != 0, t3,
        jnp.where(g3 != 0, g3, jnp.where(g2 != 0, g2, g1)))


def _next_up_pos(x):
    """nextafter(+x, +inf) for strictly-positive finite normal f32."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32) + 1, jnp.float32)


def _next_down_pos(x):
    """nextafter(+x, 0) for strictly-positive finite normal f32."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32) - 1, jnp.float32)


def _mantissa_odd(x):
    return (jax.lax.bitcast_convert_type(x, jnp.int32) & 1) == 1


def _div_resid_sign(a, b, q, d):
    """Exact sign of a - (q + d) * b, d a power of two (so d*b is exact)."""
    p, e = _two_prod(q, b)
    s1 = a - p  # exact by Sterbenz: q within a few ulps of a/b => p in [a/2, 2a]
    return _sign_sum3(s1, -e, -(d * b))


def div_rn(a, b, _seed=None):
    """RN(a / b) for finite f32 with a normal-range quotient; matches numpy's
    float32 divide bit-for-bit (including signs and ties-to-even).

    ``_seed`` (tests only) overrides the hardware |a|/|b| estimate the ulp
    walk starts from, to prove convergence from estimates up to _WALK ulps off
    on backends whose divide is already correctly rounded."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    # scale both operands to [0.5, 1): RN commutes with exact power-of-two
    # scaling, and near-1 magnitudes keep every Dekker error term far from
    # the subnormal range (where the exact-sign algebra would flush/round)
    ma, ea = jnp.frexp(jnp.abs(a))
    mb, eb = jnp.frexp(jnp.abs(b))
    ma = jnp.where(ma > 0, ma, jnp.float32(0.5))  # benign lane for a == 0
    mb = jnp.where(mb > 0, mb, jnp.float32(0.5))
    q0 = ma / mb  # hardware estimate (possibly a few ulps off on TPU)
    q = (q0 if _seed is None else
         jnp.ldexp(jnp.abs(jnp.asarray(_seed, jnp.float32)), eb - ea))

    for _ in range(_WALK):
        # above the upper midpoint -> move up (or take the even side on a tie)
        up = _next_up_pos(q)
        d_hi = (up - q) * jnp.float32(0.5)
        t_hi = _div_resid_sign(ma, mb, q, d_hi)
        q = jnp.where(
            (t_hi > 0) | ((t_hi == 0) & _mantissa_odd(q)), up, q)
    for _ in range(_WALK):
        dn = _next_down_pos(q)
        d_lo = (dn - q) * jnp.float32(0.5)  # negative power of two
        t_lo = _div_resid_sign(ma, mb, q, d_lo)
        q = jnp.where(
            (t_lo < 0) | ((t_lo == 0) & _mantissa_odd(q)), dn, q)

    q = jnp.ldexp(q, ea - eb)  # exact while the result stays normal
    out = jnp.where(jnp.signbit(a) != jnp.signbit(b), -q, q)
    # outside the walked domain (zero/inf/nan operands, sub/overflowing
    # quotient): fall back to the hardware result signed like the inputs
    k = ea - eb
    regular = (jnp.isfinite(a) & jnp.isfinite(b) & (a != 0) & (b != 0)
               & (k >= -125) & (k <= 126))
    return jnp.where(regular, out, a / b)


def _sqrt_resid_sign(x, s, d):
    """Exact sign of x - (s + d)^2 = x - s*s - 2*s*d - d*d, d a power of two."""
    p, e = _two_prod(s, s)
    s1 = x - p  # exact by Sterbenz (s within ulps of sqrt(x))
    return _sign_sum4(s1, -e, -(jnp.float32(2.0) * s * d), -(d * d))


def sqrt_rn(x, _seed=None):
    """RN(sqrt(x)) for finite non-negative f32; matches numpy bit-for-bit.

    (sqrt ties cannot occur — the square of a 25-bit midpoint needs 49 bits and
    f32 inputs have 24 — so the tie branch only defends the walk's seed.)"""
    x = jnp.asarray(x, jnp.float32)
    s0 = jnp.sqrt(x)
    # scale to an even exponent: x = m * 4^h with m in [0.5, 2), so the walk
    # runs near 1 (Dekker terms far from subnormal) and the 2^h scale-back of
    # the root is exact
    m, e = jnp.frexp(x)
    m = jnp.where(m > 0, m, jnp.float32(0.5))  # benign lane for x <= 0
    odd = (e & 1) != 0
    m = jnp.where(odd, m * jnp.float32(2.0), m)
    h = jnp.where(odd, (e - 1) // 2, e // 2)
    sm = jnp.sqrt(m)
    s = (sm if _seed is None else
         jnp.ldexp(jnp.asarray(_seed, jnp.float32), -h))
    for _ in range(_WALK):
        up = _next_up_pos(s)
        d_hi = (up - s) * jnp.float32(0.5)
        t_hi = _sqrt_resid_sign(m, s, d_hi)
        s = jnp.where(
            (t_hi > 0) | ((t_hi == 0) & _mantissa_odd(s)), up, s)
    for _ in range(_WALK):
        dn = _next_down_pos(s)
        d_lo = (dn - s) * jnp.float32(0.5)
        t_lo = _sqrt_resid_sign(m, s, d_lo)
        s = jnp.where(
            (t_lo < 0) | ((t_lo == 0) & _mantissa_odd(s)), dn, s)
    s = jnp.ldexp(s, h)
    regular = jnp.isfinite(x) & (x > 0) & (s0 >= jnp.float32(2 ** -126))
    return jnp.where(regular, s, s0)
