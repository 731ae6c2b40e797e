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


def segment_ray_index(tri_a, tri_b, tri_c, ray_count, ray_base, active,
                      width: int, height: int):
    """Per-pixel (segment id, global ray index) map — the phase-2 index math.

    Runs as an UNROLLED loop over the 4 segments on (H, W) arrays with
    per-segment scalars — no (H, W, 4) buffers, no argmax/take_along_axis
    (which XLA lowers very poorly on TPU; measured ~25x slower than this form
    at 1080p).  Selection semantics match the oracle exactly: first triangle
    containing the pixel wins, else the first-of-equal-maxima best
    minimum-barycentric score.
    """
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]  # (1, W)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]  # (H, 1)

    neg_inf = jnp.float32(-np.inf)
    best_score = jnp.full((height, width), neg_inf, jnp.float32)
    best_id = jnp.zeros((height, width), jnp.int32)
    inside_any = jnp.zeros((height, width), jnp.bool_)
    inside_id = jnp.zeros((height, width), jnp.int32)
    ray_idx_acc = jnp.zeros((height, width), jnp.int32)
    bms, bns = [], []

    for si in range(4):
        v0x = tri_b[si, 0] - tri_a[si, 0]
        v0y = tri_b[si, 1] - tri_a[si, 1]
        v1x = tri_c[si, 0] - tri_a[si, 0]
        v1y = tri_c[si, 1] - tri_a[si, 1]
        v2x = px - tri_a[si, 0]
        v2y = py - tri_a[si, 1]
        den = v0x * v1y - v1x * v0y
        den = jnp.where(den == 0, 1e-30, den)
        b_max = (v2x * v1y - v1x * v2y) / den  # weight of max corner
        b_min = (v0x * v2y - v2x * v0y) / den  # weight of min corner
        b_vp = 1.0 - b_max - b_min
        score = jnp.minimum(jnp.minimum(b_vp, b_max), b_min)
        score = jnp.where(active[si], score, neg_inf)
        bms.append(b_max)
        bns.append(b_min)

        inside = score >= 0.0
        take_inside = inside & ~inside_any
        inside_id = jnp.where(take_inside, si, inside_id)
        inside_any = inside_any | inside
        better = score > best_score  # strict: first of equal maxima wins
        best_id = jnp.where(better, si, best_id)
        best_score = jnp.maximum(best_score, score)

    seg_id = jnp.where(inside_any, inside_id, best_id)

    for si in range(4):
        denom = bms[si] + bns[si]
        x = jnp.where(denom != 0, bms[si] / denom, 0.0)
        rc = ray_count[si]
        ridx = jnp.clip(jnp.floor(x * rc.astype(jnp.float32)).astype(jnp.int32),
                        0, rc - 1) + ray_base[si]
        ray_idx_acc = jnp.where(seg_id == si, ridx, ray_idx_acc)

    return seg_id, ray_idx_acc


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reproject(raybuf_argb, tri_a, tri_b, tri_c, ray_count, ray_base, active,
              width: int, height: int, skybox=jnp.uint32(0xFF191919)):
    """(R, P) resolved raybuffer -> (H, W) screen (row 0 = bottom); XLA gather."""
    seg_id, ray_idx = segment_ray_index(tri_a, tri_b, tri_c, ray_count,
                                        ray_base, active, width, height)
    texel = jnp.where(seg_id < 2,
                      jnp.broadcast_to(jnp.arange(height)[:, None], (height, width)),
                      jnp.broadcast_to(jnp.arange(width)[None, :], (height, width)))
    out = raybuf_argb[jnp.clip(ray_idx, 0, raybuf_argb.shape[0] - 1), texel]
    return jnp.where(active.any(), out, skybox)


def reproject_pallas(raybuf_idx, tri_a, tri_b, tri_c, ray_count, ray_base,
                     active, width: int, height: int, skybox=jnp.int32(0),
                     interpret: bool = False):
    """Same result as `reproject` for an int32 color-INDEX raybuffer, with the
    2-D sample done by the windowed Pallas kernel (ops/reproject_kernel) —
    identical index math, bit-identical output."""
    from cpuvox_tpu.ops import reproject_kernel as rk

    seg_id, ray_idx = segment_ray_index(tri_a, tri_b, tri_c, ray_count,
                                        ray_base, active, width, height)
    out = rk.reproject_sample(raybuf_idx, seg_id, ray_idx, width, height,
                              interpret=interpret)
    return jnp.where(active.any(), out, skybox)
