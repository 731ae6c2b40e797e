"""Device-side per-frame ray initialization (jnp).

Per-frame host->device traffic through this environment's TPU tunnel is expensive, so
the per-ray setup the host numpy path builds in raymarch.init_rays (DDASetupJob +
TraceToFirstColumnJob + SetupProjectedPlaneParams, DrawSegmentRayJob.cs:49-143,622-651)
is re-expressed here as jnp on a tiny per-segment parameter table; the whole frame then
compiles into one dispatch whose inputs are a few hundred bytes of camera/segment data.

Float semantics match the numpy init exactly (same float32 op order), keeping the
bit-equality chain oracle == XLA == Pallas intact.  XLA contracts `a*b + c`
into FMAs (no intermediate rounding), which drifts a few ULPs vs numpy's
separately-rounded mul+add — round 2 saw that flip ~110 pixels on mesh+LOD
content.  Every multiply whose result feeds an add/sub is therefore pinned by
multiplying it with a runtime-opaque 1.0 (`_pin_one`): the backend's FMA
contraction then consumes the harmless outer multiply and the product's own
rounding survives.  (optimization_barrier and bitcast round-trips do NOT stop
the contraction — it happens at LLVM/Mosaic codegen, measured on the CPU
backend.)  The two tiny matmuls are also expanded to numpy's
sequential-accumulation order.

TPU hardware divide/sqrt are not IEEE-rounded (~35% of f32 divides differ by
an ulp), so every divide and sqrt here goes through utils/ieee.py's
correctly-rounded soft implementations (Dekker two-products + exact-sign
midpoint walks, pure f32) — with those plus the FMA pins, device init is
bit-exact vs the numpy path on both CPU and TPU (perf/check_device_init.py
is the on-device proof), which is what lets host_init default to False.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.ieee import div_rn, sqrt_rn
from . import segments as sg
from .camera import CameraData
from .raymarch import DDAState, RayStatic

F = np.float32


def _pin_one(p: "FrameParams"):
    """A runtime-opaque float32 1.0 (see module docstring)."""
    return jnp.where(p.far_clip >= 0, jnp.float32(1.0), jnp.float32(2.0))


def _mat4_vec(m, v4, _m):
    """numpy `m @ v` for (4,4) @ (4,): sequential left-to-right accumulation
    with separately-rounded products."""
    acc = _m(m[:, 0] * v4[0])
    acc = acc + _m(m[:, 1] * v4[1])
    acc = acc + _m(m[:, 2] * v4[2])
    return acc + _m(m[:, 3] * v4[3])


class FrameParams(NamedTuple):
    """Tiny per-frame arrays built on host (see build_frame_params)."""

    seg_ray_start: jnp.ndarray  # (4,) i32 — first global ray index of segment
    seg_ray_count: jnp.ndarray  # (4,) i32
    seg_plane_min: jnp.ndarray  # (4, 2) f32 CamLocalPlaneRayMin
    seg_plane_max: jnp.ndarray  # (4, 2) f32
    seg_axis_y: jnp.ndarray  # (4,) i32
    seg_orig_min: jnp.ndarray  # (4,) i32
    seg_orig_max: jnp.ndarray  # (4,) i32
    world_to_screen: jnp.ndarray  # (4, 4) f32
    cam_pos: jnp.ndarray  # (3,) f32
    lod_distances: jnp.ndarray  # (10,) f32 (padded with +inf)
    far_clip: jnp.ndarray  # () f32


def build_frame_params(cam_data: CameraData, segs: list[sg.SegmentData],
                       ctxs: list[sg.SegmentContext]) -> FrameParams:
    start = np.zeros(4, np.int32)
    count = np.zeros(4, np.int32)
    pmin = np.zeros((4, 2), F)
    pmax = np.zeros((4, 2), F)
    axis = np.zeros(4, np.int32)
    omin = np.zeros(4, np.int32)
    omax = np.full(4, -1, np.int32)
    acc = 0
    for i, (seg, ctx) in enumerate(zip(segs, ctxs)):
        start[i] = acc
        count[i] = seg.ray_count
        acc += seg.ray_count
        if seg.ray_count > 0:
            pmin[i] = seg.cam_local_plane_ray_min
            pmax[i] = seg.cam_local_plane_ray_max
            axis[i] = ctx.axis_mapped_to_y
            omin[i] = ctx.next_free_pixel_min
            omax[i] = ctx.next_free_pixel_max
    lodd = np.append(cam_data.lod_distances.astype(F), [np.float32(np.inf)] * 4)
    return FrameParams(
        seg_ray_start=jnp.asarray(start), seg_ray_count=jnp.asarray(count),
        seg_plane_min=jnp.asarray(pmin), seg_plane_max=jnp.asarray(pmax),
        seg_axis_y=jnp.asarray(axis), seg_orig_min=jnp.asarray(omin),
        seg_orig_max=jnp.asarray(omax),
        world_to_screen=jnp.asarray(cam_data.world_to_screen),
        cam_pos=jnp.asarray(cam_data.position),
        lod_distances=jnp.asarray(lodd[:10]),
        far_clip=jnp.float32(cam_data.far_clip))


def init_rays_device(p: FrameParams, dims, R: int):
    """jnp init: returns (RayStatic, DDAState, alive0) for R padded rays."""
    X, Z = dims[0], dims[2]
    world_max_y = jnp.float32(dims[1])
    ray_ids = jnp.arange(R, dtype=jnp.int32)
    one = _pin_one(p)

    def _m(x):
        return x * one

    # segment membership: seg_ray_start is cumulative, so searchsorted-style select
    ends = p.seg_ray_start + p.seg_ray_count  # (4,)
    seg_id = jnp.sum((ray_ids[:, None] >= ends[None, :]).astype(jnp.int32), axis=1)
    seg_id = jnp.clip(seg_id, 0, 3)
    n_rays = ends[3]
    in_use = ray_ids < n_rays

    plane_index = ray_ids - p.seg_ray_start[seg_id]
    rc = jnp.maximum(p.seg_ray_count[seg_id], 1)
    # DDASetupJob (DrawSegmentRayJob.cs:58-69): lerp + normalize
    t = div_rn(plane_index.astype(jnp.float32), rc.astype(jnp.float32))
    lo = p.seg_plane_min[seg_id]
    hi = p.seg_plane_max[seg_id]
    d = lo + _m((hi - lo) * t[:, None])
    norm = sqrt_rn(_m(d[:, 0] * d[:, 0]) + _m(d[:, 1] * d[:, 1]))[:, None]
    dirs = div_rn(d, norm)
    dirs = jnp.where(in_use[:, None], dirs, jnp.array([[1.0, 0.0]], jnp.float32))

    axis_y = p.seg_axis_y[seg_id]
    orig_min = jnp.where(in_use, p.seg_orig_min[seg_id], 0)
    orig_max = jnp.where(in_use, p.seg_orig_max[seg_id], -1)

    # --- SegmentDDAData ctor (SegmentDDAData.cs:17-28)
    start = p.cam_pos[jnp.array([0, 2])]
    pos = jnp.broadcast_to(jnp.floor(start).astype(jnp.int32)[None, :], (R, 2))
    tdelta = div_rn(jnp.float32(1.0),
                    jnp.maximum(jnp.float32(1e-7), jnp.abs(dirs)))
    sign_dir = jnp.sign(dirs)
    stp = sign_dir.astype(jnp.int32)
    frac = start - jnp.floor(start)
    tmax = _m((_m(sign_dir * -frac[None, :]) + _m(sign_dir * 0.5) + 0.5) * tdelta)
    ids = jnp.stack([(tmax - tdelta).max(1), tmax.min(1)], axis=1)
    alive = in_use
    lod = jnp.zeros(R, jnp.int32)

    # --- TraceToFirstColumnJob (:95-143)
    outside = ((pos[:, 0] < 0) | (pos[:, 0] >= X)
               | (pos[:, 1] < 0) | (pos[:, 1] >= Z))
    any_outside = outside[0]  # all rays share the camera cell -> same in/out status

    def handle_outside(args):
        pos, tmax, tdelta, stp, ids, lod, alive = args
        hit, n_pos, n_tmax, n_ids = _step_to_world_intersection_jnp(
            start, dirs, tdelta, jnp.array([X, Z], jnp.float32), _m)
        # host init only touches `outside & alive` lanes (raymarch.py sel=
        # nonzero(outside & alive)); mask the same way so dead/padded lanes
        # keep their ctor values and the whole state stays bit-equal, not
        # just the lanes that can reach pixels
        upd = alive[:, None]
        alive = alive & hit
        pos = jnp.where(upd, n_pos, pos)
        tmax = jnp.where(upd, n_tmax, tmax)
        ids = jnp.where(upd, n_ids, ids)

        def ff_body(_, st):  # LOD fast-forward (:123-128)
            pos, tmax, tdelta, stp, ids, lod = st
            adv = alive & (ids[:, 0] >= p.lod_distances[jnp.clip(lod, 0, 9)])
            vsize = jnp.left_shift(1, lod).astype(jnp.int32)
            rem = pos & (2 * vsize - 1)[:, None]
            tmax_prev = tmax - tdelta
            low = rem < vsize[:, None]
            inc = (dirs >= 0) == low
            tmax_n = jnp.where(inc, tmax + tdelta, tmax)
            tmax_prev = jnp.where(~inc, tmax_prev - tdelta, tmax_prev)
            ids_n = jnp.stack([tmax_prev.max(1), tmax_n.min(1)], axis=1)
            a2 = adv[:, None]
            return (jnp.where(a2, pos - rem, pos), jnp.where(a2, tmax_n, tmax),
                    jnp.where(a2, tdelta * 2.0, tdelta),
                    jnp.where(a2, stp * 2, stp), jnp.where(a2, ids_n, ids),
                    jnp.where(adv, lod + 1, lod))

        pos, tmax, tdelta, stp, ids, lod = jax.lax.fori_loop(
            0, 8, ff_body, (pos, tmax, tdelta, stp, ids, lod))
        beyond = tmax.min(1) >= p.far_clip  # IsBeyondFarClip (:130)
        alive = alive & ~beyond
        return pos, tmax, tdelta, stp, ids, lod, alive

    pos, tmax, tdelta, stp, ids, lod, alive = jax.lax.cond(
        any_outside, handle_outside, lambda a: a,
        (pos, tmax, tdelta, stp, ids, lod, alive))

    # --- SetupProjectedPlaneParams (:622-651)
    m = p.world_to_screen
    pb4 = _mat4_vec(m, (start[0], jnp.float32(0.0), start[1], jnp.float32(1.0)),
                    _m)
    pt4 = _mat4_vec(m, (start[0], world_max_y, start[1], jnp.float32(1.0)), _m)
    # pd4[:, i] = sum_j dir4[j] * m[i, j], sequential like numpy's dir4 @ m.T;
    # dir4 = (dirs.x, 0, dirs.z, 0)
    zero = jnp.zeros(R, jnp.float32)
    pd4 = jnp.stack([
        ((_m(dirs[:, 0] * m[i, 0]) + _m(zero * m[i, 1]))
         + _m(dirs[:, 1] * m[i, 2])) + _m(zero * m[i, 3])
        for i in range(4)], axis=1)
    sel = jnp.where(axis_y[:, None] == 0, jnp.array([[0, 2, 3]]),
                    jnp.array([[1, 2, 3]]))
    plane_bottom = pb4[sel]
    plane_top = pt4[sel]
    plane_dir = jnp.take_along_axis(pd4, sel, axis=1)

    static = RayStatic(dirs=dirs, plane_bottom=plane_bottom, plane_top=plane_top,
                       plane_dir=plane_dir, orig_min=orig_min, orig_max=orig_max)
    dda = DDAState(pos=pos, tmax=tmax, tdelta=tdelta, stp=stp, ids=ids, lod=lod)
    return static, dda, alive


def _step_to_world_intersection_jnp(start, dirs, tdelta, dims_f, _m):
    """SegmentDDAData.StepToWorldIntersection (:75-130), batched jnp."""
    inf = jnp.float32(np.inf)
    tmin = jnp.full_like(dirs, -inf)
    tmax_ = jnp.full_like(dirs, inf)
    for ax in range(2):
        nz = dirs[:, ax] != 0.0
        t1 = div_rn(-start[ax], dirs[:, ax])
        t2 = div_rn(dims_f[ax] - start[ax], dirs[:, ax])
        tmin = tmin.at[:, ax].set(jnp.where(nz, jnp.minimum(t1, t2), -inf))
        tmax_ = tmax_.at[:, ax].set(jnp.where(nz, jnp.maximum(t1, t2), inf))
    tmint = tmin.max(1)
    tmaxt = tmax_.min(1)
    hit = ~((tmaxt < tmint) | (tmint <= 0.0))

    use_x = (tmin[:, 0] < tmin[:, 1]) & (tmin[:, 0] != -inf)
    t_last = jnp.zeros_like(dirs)
    for ax, other in ((0, 1), (1, 0)):
        mask = use_x if ax == 0 else ~use_x
        off = _m(tmint * dirs[:, ax])
        hitpos = start[ax] + off
        hitpos = jnp.where(dirs[:, ax] > 0, jnp.floor(hitpos), jnp.ceil(hitpos))
        tl = div_rn(hitpos - start[ax], dirs[:, ax])
        t_last = t_last.at[:, ax].set(jnp.where(mask, tl, t_last[:, ax]))
        t_last = t_last.at[:, other].set(
            jnp.where(mask, tmin[:, other], t_last[:, other]))
    new_tmax = t_last + tdelta
    ids = jnp.stack([t_last.max(1), new_tmax.min(1)], axis=1)
    mid = ids[:, 0] + _m((ids[:, 1] - ids[:, 0]) * 0.5)
    pos = jnp.floor(start[None, :] + _m(mid[:, None] * dirs)).astype(jnp.int32)
    return hit, pos, new_tmax, ids
