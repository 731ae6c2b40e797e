"""Phase 2: raybuffer -> screen reprojection as a pure XLA gather.

The reference does this with a 12-vertex screen-space mesh + fragment shader
(RenderManager.BlitSegments:199-256, Shaders/RayBufferBlit.shader:47-63).  On TPU the
raybuffer never leaves HBM: we compute, per screen pixel, (segment id, ray index,
texel index) with elementwise math and do one gather.  The spec matches
oracle.reproject_oracle: a pixel center belongs to the first segment triangle
(vp, max_screen, min_screen) containing it (fallback: the triangle with the largest
minimum barycentric), ray index = offset + floor(RayCount * bMax/(bMax+bMin)), texel =
screen y for segments 0/1 and screen x for 2/3.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cpuvox_tpu.render import segments as sg

F = np.float32


def reproject_tables(segs: list[sg.SegmentData], ctxs: list[sg.SegmentContext],
                     vp_screen, n_topdown_rays: int):
    """Host-side per-frame constants for the reprojection gather."""
    vp = np.asarray(vp_screen, F)
    tri_a = np.zeros((4, 2), F)  # vp
    tri_b = np.zeros((4, 2), F)  # max corner
    tri_c = np.zeros((4, 2), F)  # min corner
    ray_count = np.zeros(4, np.int32)
    ray_base = np.zeros(4, np.int32)  # global row in the concatenated raybuffer
    active = np.zeros(4, bool)
    for si, (seg, ctx) in enumerate(zip(segs, ctxs)):
        if seg.ray_count <= 0:
            continue
        active[si] = True
        tri_a[si] = vp
        tri_b[si] = seg.max_screen
        tri_c[si] = seg.min_screen
        ray_count[si] = seg.ray_count
        ray_base[si] = (0 if si < 2 else n_topdown_rays) + ctx.ray_index_offset
    return dict(tri_a=tri_a, tri_b=tri_b, tri_c=tri_c, ray_count=ray_count,
                ray_base=ray_base, active=active)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reproject(raybuf_argb, tri_a, tri_b, tri_c, ray_count, ray_base, active,
              width: int, height: int, skybox=jnp.uint32(0xFF191919)):
    """(R, P) resolved ARGB raybuffer -> (H, W) uint32 screen (row 0 = bottom)."""
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :, None]  # (1, W, 1)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None, None]  # (H, 1, 1)

    a = tri_a[None, None, :, :]  # (1, 1, 4, 2)
    v0 = (tri_b - tri_a)[None, None, :, :]
    v1 = (tri_c - tri_a)[None, None, :, :]
    v2x = px - a[..., 0]
    v2y = py - a[..., 1]
    den = v0[..., 0] * v1[..., 1] - v1[..., 0] * v0[..., 1]
    den = jnp.where(den == 0, 1e-30, den)
    b_max = (v2x * v1[..., 1] - v1[..., 0] * v2y) / den  # weight of max corner
    b_min = (v0[..., 0] * v2y - v2x * v0[..., 1]) / den  # weight of min corner
    b_vp = 1.0 - b_max - b_min
    score = jnp.minimum(jnp.minimum(b_vp, b_max), b_min)  # (H, W, 4)
    score = jnp.where(active[None, None, :], score, -jnp.inf)

    inside = score >= 0.0
    # first inside triangle wins; else the best score (argmax takes the first of
    # equal maxima, matching the oracle's strict-greater scan)
    pick_inside = jnp.argmax(
        inside.astype(jnp.int32) * (4 - jnp.arange(4))[None, None, :], axis=-1)
    pick_best = jnp.argmax(score, axis=-1)
    seg_id = jnp.where(inside.any(axis=-1), pick_inside, pick_best)

    bm = jnp.take_along_axis(b_max, seg_id[..., None], axis=-1)[..., 0]
    bn = jnp.take_along_axis(b_min, seg_id[..., None], axis=-1)[..., 0]
    denom = bm + bn
    x = jnp.where(denom != 0, bm / denom, 0.0)
    rc = ray_count[seg_id]
    ray_idx = jnp.clip(jnp.floor(x * rc.astype(jnp.float32)).astype(jnp.int32),
                       0, rc - 1) + ray_base[seg_id]

    texel = jnp.where(seg_id < 2,
                      jnp.broadcast_to(jnp.arange(height)[:, None], (height, width)),
                      jnp.broadcast_to(jnp.arange(width)[None, :], (height, width)))
    out = raybuf_argb[jnp.clip(ray_idx, 0, raybuf_argb.shape[0] - 1), texel]
    return jnp.where(active.any(), out, skybox)
