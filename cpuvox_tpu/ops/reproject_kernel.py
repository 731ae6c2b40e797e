"""Pallas TPU kernel for the phase-2 raybuffer->screen sample.

The reprojection gather out[y, x] = raybuf[ray_idx(y, x), texel(y, x)] is the
XLA-side cost center of phase 2 (an arbitrary 2-D gather lowers to ~25ns/element
on TPU).  Structure kills it: texel rides screen lanes exactly (texel == y for
top-down segments, == x for left-right, RayBufferBlit.shader:55-62), and the ray
index varies slowly along the OTHER screen axis — so a (8, 128) screen tile only
touches a narrow band of raybuffer rows:

- LR pass: tiles are (8 y, 128 x); the source slice rb[rows, x0:x0+128] has the
  texels on lanes, and ray_idx varies mainly along the 8 sublanes -> a short
  select loop over the tile's ray-row window;
- TD pass: same with x and y swapped (tiles are (8 x, 128 y) over a TRANSPOSED
  index map), sampling the same rb array with y as the lane axis.

The per-pixel (segment id, ray index) map itself stays in XLA (render/reproject)
and is fed to the kernel, so both backends share bit-identical index math.
Near the vanishing point the ray window widens; the while-loop just runs longer
there (a handful of tiles per frame).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 24
WSTEP = 16  # raybuffer rows examined per select-loop iteration


def _make_sample_kernel(R):
    def kernel(ri_ref, m_ref, rb_ref, out_ref):
        ri = ri_ref[...]  # (8, 128) global raybuffer row per pixel
        m = m_ref[...] != 0
        ri_c = jnp.clip(ri, 0, R - 1)
        rmin = jnp.min(jnp.where(m, ri_c, BIG))
        rmax = jnp.max(jnp.where(m, ri_c, -1))
        rmin = jnp.minimum(rmin, R - 1) & -WSTEP

        def cond(st):
            w, _ = st
            return w <= rmax

        def body(st):
            w, acc = st
            b = rb_ref[pl.ds(jnp.minimum(w, R - WSTEP), WSTEP), :]
            base = jnp.minimum(w, R - WSTEP)
            for j in range(WSTEP):
                sel = m & (ri_c == base + j)
                acc = jnp.where(sel, b[j:j + 1, :], acc)
            return (w + WSTEP, acc)

        _, acc = jax.lax.while_loop(
            cond, body, (rmin, jnp.full(ri.shape, -1, jnp.int32)))
        out_ref[...] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_raybuffer(rb, ri, mask, interpret: bool = False):
    """out[i, j] = rb[ri[i, j], lane_texel] where lane_texel == the global lane
    (minor) index j — i.e. rb column j.  Shapes: rb (R, PL) with PL % 128 == 0;
    ri/mask (NI, NJ) with NI % 8 == 0, NJ % 128 == 0, NJ <= PL.
    Masked-off pixels return -1."""
    R, PL = rb.shape
    NI, NJ = ri.shape
    assert PL % 128 == 0 and NI % 8 == 0 and NJ % 128 == 0 and NJ <= PL, (
        rb.shape, ri.shape)
    grid = (NJ // 128, NI // 8)  # lane-block major: rb column block stays put

    kern = _make_sample_kernel(R)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NI, NJ), jnp.int32),
        interpret=interpret,
    )(ri, mask, rb)
    return out


def _pad_to(x, mult0, mult1, fill):
    h, w = x.shape
    ph = (-h) % mult0
    pw = (-w) % mult1
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
    return x


def reproject_sample(raybuf_idx, seg_id, ray_idx, width, height,
                     interpret=False):
    """Both reprojection passes: returns the (H, W) int32 sampled color-index
    screen.  seg_id/ray_idx come from the XLA index math (render/reproject)."""
    R, P = raybuf_idx.shape
    PL = P + ((-P) % 128)
    rb = raybuf_idx
    if PL != P:
        rb = jnp.pad(rb, ((0, 0), (0, PL - P)), constant_values=-1)

    # LR pass: texel == x (lanes), tiles (8 y, 128 x)
    m_lr = _pad_to((seg_id >= 2).astype(jnp.int32), 8, 128, 0)
    ri_lr = _pad_to(ray_idx, 8, 128, 0)
    lr = sample_raybuffer(rb, ri_lr, m_lr, interpret=interpret)[:height, :width]

    # TD pass: texel == y (lanes), transposed tiles (8 x, 128 y)
    m_td = _pad_to((seg_id < 2).astype(jnp.int32).T, 8, 128, 0)
    ri_td = _pad_to(ray_idx.T, 8, 128, 0)
    td = sample_raybuffer(rb, ri_td, m_td, interpret=interpret)[:width, :height]

    return jnp.where(seg_id >= 2, lr, td.T)
