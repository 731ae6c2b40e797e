"""Pallas TPU kernel for the phase-1 chunk rasterizer.

This is the performance path for the hot loop (the reference's Burst ExecuteRay,
DrawSegmentRayJob.cs:195-620; SURVEY.md §7 step 4).  Semantics are identical to the
XLA reference implementation in render/raymarch.py (which is bit-equal to the scalar
oracle); this kernel re-expresses the chunk rasterization with TPU-native layout:

- rays live on VPU *lanes*: a grid block owns BG x 128 rays, every piece of per-ray
  state is a (BG, 128) register array;
- each ray's pixel column lives along *sublanes*: the raybuffer block is
  (BG, P, 128) int32 color indices resident in VMEM for the whole chunk;
- the written-pixel frontier scans (the reference's seenPixelCache while-loops,
  DrawSegmentRayJob.cs:407-415,678-694) are replaced by CONSERVATIVE register
  updates: after a span write [lo, hi] that covers the frontier, every pixel in
  [nfp_min, hi] is written, so ``nfp_min = hi + 1`` is a valid (possibly slightly
  wide) frontier; likewise the frustum re-clip advance uses ``writable_min``
  directly.  The conservative window differs from the scanned-exact window only
  across already-written stretches, and every span write is (a) masked by the
  written test ``raybuf < 0`` and (b) clamped to the current window — so the
  raybuffer OUTPUT is bit-identical to the exact-scan semantics while the hot loop
  never reads the raybuffer for control flow (proof sketch: conservative
  nfp_min <= exact nfp_min and all pixels between them are written at that moment;
  culls/kills only fire later, and late culls draw extra spans whose pixels are
  already written);
- pixel writes are DEFERRED AND MERGED: a cell's runs are swept in registers
  (span geometry, frontier clamps, kill flags — the sequential semantics of
  DrawSegmentRayJob.cs:424-611), then ONE tile walk over the union span range
  writes all of the cell's side spans and caps for ALL BG ray groups at once.
  Draw priority inside the walk is first-covering-span-wins in reference draw
  order (side before cap, runs in iteration order), which is exactly what the
  sequential written-mask produced;
- early-outs: dead lanes are masked, deep-column worlds sweep runs in blocks of
  RB with a lane-consensus while-loop, and the cell loop exits as soon as every
  lane in the block is dead.

The content-independent DDA roll and the column gathers stay in XLA (render/raymarch),
which feeds this kernel per chunk; per-ray state is carried across chunks through
input/output aliasing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 24  # python scalar: jnp constants would be captured consts in the kernel
RB_CAP = 4  # runs swept per register block (one merged tile walk per block)


def _shift_left_one(lod):
    return jnp.left_shift(1, lod).astype(jnp.int32)


def _make_kernel(C, MAXR, BG, P, iteration_direction, world_max_y, MCC=0,
                 ablate="", rb_cap=RB_CAP, solid_min_y=None, solid_max_y=None,
                 sweep_skip=True, slot_gate=False, walk_tile=8,
                 walk_cond=True):
    WT = walk_tile if (walk_tile in (8, 16, 32) and P % walk_tile == 0) else 8
    if WT != walk_tile and not getattr(_make_kernel, "_wt_warned", False):
        # ADVICE r4: the P%16 fallback must be loud so an A/B leg can't
        # silently measure the default tile height
        _make_kernel._wt_warned = True
        import sys
        print(f"WARNING: kernel_walk_tile={walk_tile} fell back to 8 "
              f"(P={P} not divisible)", file=sys.stderr, flush=True)
    WMY = float(world_max_y)  # python scalar (weak-typed)
    # solid-bound kill scalars (None = disabled); see the kill comment below
    SMNY = None if solid_min_y is None else float(solid_min_y)
    SMXY = None if solid_max_y is None else float(solid_max_y)
    RB = min(MAXR, rb_cap)
    # MCC > 0: ARGB mode — the record carries the column's voxel colors
    # (alpha MSB cleared, so they stay >= 0 and the unwritten<0 sentinel holds);
    # span writes emit final colors instead of color indices
    # `ablate` is a perf-bisection hook (dev only — output is WRONG when set):
    # "nosweep" skips the run loop+walk, "nowalk" skips only the tile walk.
    # It is an explicit STATIC argument (part of every jit key), never an env
    # read — a stray environment variable cannot silently corrupt output.
    ABLATE = ablate
    if ABLATE:
        import sys
        print(f"WARNING: phase1 kernel ablation {ABLATE!r} active — "
              "output is intentionally WRONG (dev bisection only)",
              file=sys.stderr, flush=True)

    def reduce_pixel_horizon(rb_min, rb_max, mask, st):
        """ReducePixelHorizon (DrawSegmentRayJob.cs:660-697) on (BG,128) state.

        CONSERVATIVE frontier: the reference scans for the next unwritten pixel
        past the span (:678-680,:690-692); here the span end itself is the new
        frontier (the span is about to be fully written).  Pure register math —
        no raybuffer reads.  Output-equivalence argument in the module docstring.
        """
        nfpmin, nfpmax, fbmin, fbmax = st
        c1 = mask & (rb_min <= nfpmin)
        rb_min2 = jnp.where(c1, nfpmin, rb_min)
        inner1 = c1 & (rb_max >= nfpmin)
        new_min = rb_max + 1
        nfpmin = jnp.where(inner1, new_min, nfpmin)
        fbmin = jnp.where(inner1, new_min.astype(jnp.float32) - 0.501, fbmin)

        c2 = mask & (rb_max >= nfpmax)
        rb_max2 = jnp.where(c2, nfpmax, rb_max)
        inner2 = c2 & (rb_min2 <= nfpmax)
        new_max = rb_min2 - 1
        nfpmax = jnp.where(inner2, new_max, nfpmax)
        fbmax = jnp.where(inner2, new_max.astype(jnp.float32) + 0.501, fbmax)
        return rb_min2, rb_max2, (nfpmin, nfpmax, fbmin, fbmax)

    def clip_world_bounds(pmin_p, pmin_w, pmax_p, pmax_w, fmin, fmax):
        """CameraData.GetWorldBoundsClippingCamSpace (CameraData.cs:51-121),
        components on (BG,128)."""
        one = jnp.float32(1.0)

        def clip_pair(frustum):
            finv = one / frustum
            c0 = pmax_p * finv - pmax_w
            c1 = pmin_p * finv - pmin_w
            return one - (c0 / (c0 - c1)), c1 / (c1 - c0)

        min_fmax, max_fmax = clip_pair(fmax)
        min_fmin, max_fmin = clip_pair(fmin)
        amin = pmin_p > pmin_w * fmax
        amax = pmax_p > pmax_w * fmax
        bmin = pmin_p < pmin_w * fmin
        bmax = pmax_p < pmax_w * fmin
        clipped = (amin & amax) | (~amin & ~amax & bmin & bmax)
        min_lerp = jnp.where(
            amin, min_fmax,
            jnp.where(amax, jnp.where(bmin, min_fmin, 0.0),
                      jnp.where(bmin & ~bmax, min_fmin, 0.0)))
        max_lerp = jnp.where(
            amin, jnp.where(bmax, max_fmin, 1.0),
            jnp.where(amax, max_fmax,
                      jnp.where(~bmin & bmax, max_fmin, 1.0)))
        return clipped, min_lerp, max_lerp

    def kernel(*refs):
        # stk_r: the ONE stacked per-cell block (1, 8+MAXR+MCC, BG, 128) — grid
        # dim 1 walks the chunk's cells, so each grid step waits on a single
        # double-buffered DMA; fields are [ids0, ids1, lod, valid, n_runs,
        # color_off, cmin, cmax, runs..., colors...] (floats bitcast to int32).
        # Then per-ray constants, then the aliased state inputs, then outputs
        # (same VMEM blocks stay resident across the whole c-sweep — they double
        # as the cell-loop state carries).
        (stk_r,
         pb_p_r, pb_n_r, pb_w_r, pt_p_r, pt_n_r, pt_w_r, pd_p_r, pd_n_r, pd_w_r,
         camy_r, camyn_r, origmin_r, origmax_r,
         raybuf_in, nfpmin_in, nfpmax_in, fbmin_in, fbmax_in, fdmin_in,
         fdmax_in, factive_in, alive_in,
         raybuf_ref, nfpmin_o, nfpmax_o, fbmin_o, fbmax_o, fdmin_o, fdmax_o,
         factive_o, alive_o) = refs
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            # seed the resident output blocks once per ray-block sweep
            raybuf_ref[...] = raybuf_in[...]
            nfpmin_o[...] = nfpmin_in[...]
            nfpmax_o[...] = nfpmax_in[...]
            fbmin_o[...] = fbmin_in[...]
            fbmax_o[...] = fbmax_in[...]
            fdmin_o[...] = fdmin_in[...]
            fdmax_o[...] = fdmax_in[...]
            factive_o[...] = factive_in[...]
            alive_o[...] = alive_in[...]

        alive_i = alive_o[...]

        @pl.when(jnp.max(alive_i) > 0)
        def _cell():
            # block-level empty-cell skip: a cell step where no live lane's
            # column has runs is a provable state no-op (every cull/kill/write
            # is gated on nonempty), and mill-class worlds are mostly air
            work = (alive_i != 0) & (stk_r[0, 3] != 0) & (stk_r[0, 4] > 0)

            @pl.when(jnp.any(work))
            def _busy():
                pb_p = pb_p_r[...]
                pb_n = pb_n_r[...]
                pb_w = pb_w_r[...]
                pt_p = pt_p_r[...]
                pt_n = pt_n_r[...]
                pt_w = pt_w_r[...]
                pd_p = pd_p_r[...]
                pd_n = pd_n_r[...]
                pd_w = pd_w_r[...]
                camy = camy_r[...]
                camyn = camyn_r[...]

                nfpmin = nfpmin_o[...]
                nfpmax = nfpmax_o[...]
                fbmin = fbmin_o[...]
                fbmax = fbmax_o[...]
                fdmin = fdmin_o[...]
                fdmax = fdmax_o[...]
                fact = factive_o[...] != 0
                alive = alive_i != 0
                valid = stk_r[0, 3] != 0
                nruns = stk_r[0, 4]
                al = alive & valid
                ids_l = pltpu.bitcast(stk_r[0, 0], jnp.float32)
                ids_n = pltpu.bitcast(stk_r[0, 1], jnp.float32)
                lod = stk_r[0, 2]
                coloroff = stk_r[0, 5]
                cmin_f = stk_r[0, 6].astype(jnp.float32)
                cmax_f = stk_r[0, 7].astype(jnp.float32)

                nonempty = nruns > 0
                # ---- frustum-vs-column cull (DrawSegmentRayJob.cs:258-281)
                dist_top = jnp.where(fdmax > 0.0, ids_n, ids_l)
                dist_bot = jnp.where(fdmin < 0.0, ids_n, ids_l)
                new_max = camy + fdmax * dist_top
                new_min = camy + fdmin * dist_bot
                cull = al & nonempty & fact & ((new_min > WMY) | (new_max < 0.0))
                alive = alive & ~cull
                if SMXY is not None:
                    # solid-bound kill (output-exact): with f_active held, fdir
                    # is frozen, so for fdir_min >= 0 this cell's new_min lower-
                    # bounds every future window bottom (f32 rounding of a
                    # monotone function is monotone, same arithmetic as the
                    # skip_col test below) — new_min > max solid cmax means all
                    # future cells are provable skip_cols and the ray can never
                    # write again.  Symmetric for the window top.  Kills the
                    # post-write sky tail that otherwise marches to far clip.
                    kill_solid = al & fact & (
                        ((fdmin >= 0.0) & (new_min > SMXY))
                        | ((fdmax <= 0.0) & (new_max < SMNY)))
                    alive = alive & ~kill_solid
                skip_col = fact & ((cmin_f > new_max) | (cmax_f < new_min))
                wbmin = jnp.where(fact, new_min, 0.0)
                wbmax = jnp.where(fact, new_max, WMY)
                process = al & ~cull & ~skip_col & nonempty

                # ---- project the world column at both intersections (:289-293)
                csml_p = pb_p + pd_p * ids_l
                csml_n = pb_n + pd_n * ids_l
                csml_w = pb_w + pd_w * ids_l
                csmn_p = pb_p + pd_p * ids_n
                csmn_n = pb_n + pd_n * ids_n
                csmn_w = pb_w + pd_w * ids_n
                csxl_p = pt_p + pd_p * ids_l
                csxl_n = pt_n + pd_n * ids_l
                csxl_w = pt_w + pd_w * ids_l
                csxn_p = pt_p + pd_p * ids_n
                csxn_n = pt_n + pd_n * ids_n
                csxn_w = pt_w + pd_w * ids_n

                # ---- writable-frustum re-clip when dirty (:295-422)
                do_clip = process & (ids_l > 2.0) & ~fact
                cl_clipped, cl_min, cl_max = clip_world_bounds(
                    csml_p, csml_w, csxl_p, csxl_w, fbmin, fbmax)
                cn_clipped, cn_min, cn_max = clip_world_bounds(
                    csmn_p, csmn_w, csxn_p, csxn_w, fbmin, fbmax)
                kill_clip = do_clip & cl_clipped & cn_clipped
                alive = alive & ~kill_clip
                process = process & ~kill_clip
                do_clip = do_clip & ~kill_clip
                case_l = cl_clipped
                case_n = ~cl_clipped & cn_clipped

                sel_min = jnp.where(case_l, cn_min,
                                    jnp.where(case_n, cl_min,
                                              jnp.minimum(cl_min, cn_min)))
                sel_max = jnp.where(case_l, cn_max,
                                    jnp.where(case_n, cl_max,
                                              jnp.maximum(cl_max, cn_max)))
                wbc_min = WMY * sel_min
                wbc_max = WMY * sel_max
                dist_min = jnp.where(case_l, ids_n,
                                     jnp.where(case_n, ids_l,
                                               jnp.where(cl_min < cn_min, ids_l,
                                                         ids_n)))
                dist_max = jnp.where(case_l, ids_n,
                                     jnp.where(case_n, ids_l,
                                               jnp.where(cl_max > cn_max, ids_l,
                                                         ids_n)))
                fdmin_new = (wbc_min - camy) / dist_min
                fdmax_new = (wbc_max - camy) / dist_max

                def sx(base_p, base_w, d_p, d_w, t):
                    return (base_p + d_p * t) / (base_w + d_w * t)

                l_min_x = sx(csml_p, csml_w, csxl_p - csml_p, csxl_w - csml_w, cl_min)
                l_max_x = sx(csml_p, csml_w, csxl_p - csml_p, csxl_w - csml_w, cl_max)
                n_min_x = sx(csmn_p, csmn_w, csxn_p - csmn_p, csxn_w - csmn_w, cn_min)
                n_max_x = sx(csmn_p, csmn_w, csxn_p - csmn_p, csxn_w - csmn_w, cn_max)
                l_lo = jnp.minimum(l_min_x, l_max_x)
                l_hi = jnp.maximum(l_min_x, l_max_x)
                n_lo = jnp.minimum(n_min_x, n_max_x)
                n_hi = jnp.maximum(n_min_x, n_max_x)
                cs_clip_min = jnp.where(case_l, n_lo,
                                        jnp.where(case_n, l_lo,
                                                  jnp.minimum(l_lo, n_lo)))
                cs_clip_max = jnp.where(case_l, n_hi,
                                        jnp.where(case_n, l_hi,
                                                  jnp.maximum(l_hi, n_hi)))

                wbmin = jnp.where(do_clip, jnp.floor(wbc_min), wbmin)
                wbmax = jnp.where(do_clip, jnp.ceil(wbc_max), wbmax)
                fdmin = jnp.where(do_clip, fdmin_new, fdmin)
                fdmax = jnp.where(do_clip, fdmax_new, fdmax)
                fact = fact | do_clip

                writable_min = jnp.floor(cs_clip_min).astype(jnp.int32)
                writable_max = jnp.ceil(cs_clip_max).astype(jnp.int32)
                kill_miss = do_clip & ((writable_max < nfpmin)
                                       | (writable_min > nfpmax))
                alive = alive & ~kill_miss
                process = process & ~kill_miss
                do_clip = do_clip & ~kill_miss

                # conservative frustum advance (reference scans to the first unwritten
                # pixel >= writable_min, :407-415; writable_min itself is conservative)
                adv_min = do_clip & (writable_min > nfpmin)
                nfpmin = jnp.where(adv_min, writable_min, nfpmin)
                adv_max = do_clip & (writable_max < nfpmax)
                nfpmax = jnp.where(adv_max, writable_max, nfpmax)
                kill_closed = do_clip & (nfpmin > nfpmax)
                alive = alive & ~kill_closed
                process = process & ~kill_closed

                # ---- RLE run iteration (:424-611): sweep RB runs in registers, then
                # ONE merged tile walk writes every span of the sweep for all groups
                if iteration_direction > 0:
                    eb_min0 = jnp.full_like(wbmin, WMY)
                    eb_max0 = jnp.full_like(wbmin, WMY)
                else:
                    eb_min0 = jnp.zeros_like(wbmin)
                    eb_max0 = jnp.zeros_like(wbmin)
                vshift = _shift_left_one(lod)

                def sweep_one(k, st):
                    """Register-only semantics of one run (side span + cap):
                    geometry, frontier clamps, kill flags; returns draw params.
                    Mask entries of st ride as int32 (Mosaic can't legalize i1
                    vector layouts across scf loop carries)."""
                    (eb_min, eb_max, run_done_i, nfpmin, nfpmax, fbmin, fbmax,
                     alive_i) = st
                    run_done = run_done_i != 0
                    alive = alive_i != 0
                    # deep-world sweeps run in blocks of RB, so the last block's
                    # k can reach RB*ceil(MAXR/RB)-1 > MAXR-1 when MAXR % RB != 0;
                    # clamp the dynamic index into the stacked block (the clamped
                    # row's value is masked by k_valid below — k >= nruns there)
                    k_idx = k if isinstance(k, int) else jnp.minimum(k, MAXR - 1)
                    run = stk_r[0, 8 + k_idx]
                    length = run & 0xFFFF
                    cidx = run >> 16
                    is_air = run < 0
                    k_valid = process & alive & (k < nruns) & ~run_done

                    len_s = (length * vshift).astype(jnp.float32)
                    if iteration_direction > 0:
                        eb_max_n = eb_min
                        eb_min_n = eb_min - len_s
                    else:
                        eb_min_n = eb_max
                        eb_max_n = eb_min_n + len_s
                    eb_min = jnp.where(k_valid, eb_min_n, eb_min)
                    eb_max = jnp.where(k_valid, eb_max_n, eb_max)

                    above = eb_min > wbmax
                    below = eb_max < wbmin
                    if iteration_direction > 0:
                        brk = k_valid & ~is_air & below
                    else:
                        brk = k_valid & ~is_air & above
                    run_done = run_done | brk
                    draw = k_valid & ~is_air & ~above & ~below

                    portion_bottom = eb_min / WMY
                    portion_top = eb_max / WMY
                    cfb_p = csml_p + (csxl_p - csml_p) * portion_bottom
                    cfb_n = csml_n + (csxl_n - csml_n) * portion_bottom
                    cfb_w = csml_w + (csxl_w - csml_w) * portion_bottom
                    cft_p = csml_p + (csxl_p - csml_p) * portion_top
                    cft_n = csml_n + (csxl_n - csml_n) * portion_top
                    cft_w = csml_w + (csxl_w - csml_w) * portion_top

                    # --- side span (:484-542): near clip with uv interpolation
                    u_a = length.astype(jnp.float32)
                    u_b = jnp.zeros_like(u_a)
                    a_behind = cfb_n <= 0.0
                    b_behind = cft_n <= 0.0
                    vis = ~(a_behind & b_behind)
                    v_a = cft_n / (cft_n - cfb_n)
                    v_b = cfb_n / (cfb_n - cft_n)
                    clip_a = a_behind & ~b_behind
                    clip_b = b_behind & ~a_behind
                    fa_p = jnp.where(clip_a, cft_p + (cfb_p - cft_p) * v_a, cfb_p)
                    fa_w = jnp.where(clip_a, cft_w + (cfb_w - cft_w) * v_a, cfb_w)
                    u_a2 = jnp.where(clip_a, u_b + (u_a - u_b) * v_a, u_a)
                    fb2_p = jnp.where(clip_b, cfb_p + (cft_p - cfb_p) * v_b, cft_p)
                    fb2_w = jnp.where(clip_b, cfb_w + (cft_w - cfb_w) * v_b, cft_w)
                    u_b2 = jnp.where(clip_b, u_a + (u_b - u_a) * v_b, u_b)

                    side = draw & vis
                    uva0 = 1.0 / fa_w
                    uva1 = u_a2 / fa_w
                    uvb0 = 1.0 / fb2_w
                    uvb1 = u_b2 / fb2_w
                    rbf_a = fa_p / fa_w
                    rbf_b = fb2_p / fb2_w
                    flip = rbf_a > rbf_b
                    rbf_lo = jnp.where(flip, rbf_b, rbf_a)
                    rbf_hi = jnp.where(flip, rbf_a, rbf_b)
                    uvlo0 = jnp.where(flip, uvb0, uva0)
                    uvlo1 = jnp.where(flip, uvb1, uva1)
                    uvhi0 = jnp.where(flip, uva0, uvb0)
                    uvhi1 = jnp.where(flip, uva1, uvb1)
                    rb_min = jnp.round(rbf_lo).astype(jnp.int32)
                    rb_max = jnp.round(rbf_hi).astype(jnp.int32)
                    overlap = side & (rb_max >= nfpmin) & (rb_min <= nfpmax)
                    rb_min2, rb_max2, (nfpmin, nfpmax, fbmin, fbmax) = \
                        reduce_pixel_horizon(rb_min, rb_max, overlap,
                                             (nfpmin, nfpmax, fbmin, fbmax))
                    killed = overlap & (nfpmin > nfpmax)
                    alive = alive & ~killed

                    # --- top/bottom cap (:544-610)
                    live = draw & alive
                    top_cap = portion_top < camyn
                    bot_cap = ~top_cap & (portion_bottom > camyn)
                    skip_top = top_cap & (eb_max > wbmax)
                    skip_bot = bot_cap & (eb_min < wbmin)
                    cap = live & ((top_cap & ~skip_top) | (bot_cap & ~skip_bot))
                    sec_idx = jnp.where(top_cap, cidx, cidx + length - 1)
                    portion_cap = jnp.where(top_cap, portion_top, portion_bottom)
                    sa_p = csmn_p + (csxn_p - csmn_p) * portion_cap
                    sa_n = csmn_n + (csxn_n - csmn_n) * portion_cap
                    sa_w = csmn_w + (csxn_w - csmn_w) * portion_cap
                    sb_p = jnp.where(top_cap, cft_p, cfb_p)
                    sb_n = jnp.where(top_cap, cft_n, cfb_n)
                    sb_w = jnp.where(top_cap, cft_w, cfb_w)

                    a2_behind = sa_n <= 0.0
                    b2_behind = sb_n <= 0.0
                    vis2 = ~(a2_behind & b2_behind)
                    v2a = sb_n / (sb_n - sa_n)
                    v2b = sa_n / (sa_n - sb_n)
                    c2a = a2_behind & ~b2_behind
                    c2b = b2_behind & ~a2_behind
                    sa2_p = jnp.where(c2a, sb_p + (sa_p - sb_p) * v2a, sa_p)
                    sa2_w = jnp.where(c2a, sb_w + (sa_w - sb_w) * v2a, sa_w)
                    sb2_p = jnp.where(c2b, sa_p + (sb_p - sa_p) * v2b, sb_p)
                    sb2_w = jnp.where(c2b, sa_w + (sb_w - sa_w) * v2b, sb_w)
                    cap = cap & vis2
                    r2a = jnp.round(sa2_p / sa2_w)
                    r2b = jnp.round(sb2_p / sb2_w)
                    rb2_min = jnp.minimum(r2a, r2b).astype(jnp.int32)
                    rb2_max = jnp.maximum(r2a, r2b).astype(jnp.int32)
                    overlap2 = cap & (rb2_max >= nfpmin) & (rb2_min <= nfpmax)
                    rb2_min2, rb2_max2, (nfpmin, nfpmax, fbmin, fbmax) = \
                        reduce_pixel_horizon(rb2_min, rb2_max, overlap2,
                                             (nfpmin, nfpmax, fbmin, fbmax))
                    killed2 = overlap2 & (nfpmin > nfpmax)
                    alive = alive & ~killed2

                    if MCC:
                        # ARGB mode: resolve the cap color now (register select over
                        # the column's inline colors); side spans resolve per pixel
                        # in the walk
                        cap_col = jnp.zeros_like(sec_idx)
                        for kk in range(MCC):
                            cap_col = jnp.where(sec_idx == kk,
                                                stk_r[0, 8 + MAXR + kk], cap_col)
                        base_col = cidx  # local color base for the walk's select
                    else:
                        cap_col = coloroff + sec_idx
                        base_col = coloroff + cidx
                    params = dict(
                        overlap=overlap, rb_min=rb_min2, rb_max=rb_max2,
                        rbf_lo=rbf_lo, inv_span=1.0 / (rbf_hi - rbf_lo),
                        uvlo0=uvlo0, uvlo1=uvlo1, uvhi0=uvhi0, uvhi1=uvhi1,
                        base_col=base_col, len_m1=length - 1,
                        overlap2=overlap2, rb2_min=rb2_min2, rb2_max=rb2_max2,
                        cap_col=cap_col,
                    )
                    return (eb_min, eb_max, run_done.astype(jnp.int32), nfpmin,
                            nfpmax, fbmin, fbmax, alive.astype(jnp.int32)), params

                def merged_walk(slots, wrote):
                    """Tile walks writing every span of the sweep.  One walk per
                    BG ray-row with that row's OWN bounds: a block's 8 rows hold
                    unrelated columns, so a shared union span made every row-
                    iteration pay 8x vector work over mostly-uncovered rows.
                    First-covering-wins in reference draw order replaces the
                    sequential written-mask exactly (writes never overwrite)."""
                    if ABLATE == "nowalk":
                        return wrote
                    # per-lane bounds, combined across slots
                    lo_v = jnp.full((BG, 128), BIG, jnp.int32)
                    hi_v = jnp.full((BG, 128), -1, jnp.int32)
                    for prm in slots:
                        lo_v = jnp.minimum(lo_v, jnp.where(
                            prm["overlap"], prm["rb_min"], BIG))
                        hi_v = jnp.maximum(hi_v, jnp.where(
                            prm["overlap"], prm["rb_max"], -1))
                        lo_v = jnp.minimum(lo_v, jnp.where(
                            prm["overlap2"], prm["rb2_min"], BIG))
                        hi_v = jnp.maximum(hi_v, jnp.where(
                            prm["overlap2"], prm["rb2_max"], -1))

                    wrote_rows = []
                    for g_row in range(BG):
                        lo_g = jnp.maximum(jnp.min(lo_v[g_row]), 0) & -WT
                        hi_g = jnp.minimum(jnp.max(hi_v[g_row]), P - 1)

                        def wcond(st, hi_g=hi_g):
                            w, _ = st
                            return w <= hi_g

                        def wbody(st, g_row=g_row):
                            w, wr = st
                            rows_i = (jax.lax.broadcasted_iota(
                                jnp.int32, (WT, 128), 0) + w)
                            rows_f = rows_i.astype(jnp.float32)
                            # cheap coverage test first: skip tile IO and span
                            # math for row-tiles no lane of this row covers
                            covs = []
                            anyc = jnp.zeros((), jnp.bool_)
                            for prm in slots:
                                e = lambda x: prm[x][g_row][None, :]
                                in_s = ((rows_i >= e("rb_min"))
                                        & (rows_i <= e("rb_max"))
                                        & e("overlap"))
                                in_c = ((rows_i >= e("rb2_min"))
                                        & (rows_i <= e("rb2_max"))
                                        & e("overlap2"))
                                covs.append((in_s, in_c))
                                anyc = anyc | jnp.any(in_s) | jnp.any(in_c)

                            def busy_row():
                                tile = raybuf_ref[g_row, pl.ds(w, WT), :]
                                chosen = jnp.zeros_like(tile)
                                claimed = jnp.zeros(tile.shape, jnp.bool_)
                                for prm, (in_s, in_c) in zip(slots, covs):
                                    e = lambda x: prm[x][g_row][None, :]

                                    def side_val(e=e):
                                        # per-pixel uv interpolation + divide
                                        # for this slot's side span
                                        l = ((rows_f - e("rbf_lo"))
                                             * e("inv_span"))
                                        wu0 = (e("uvlo0")
                                               + (e("uvhi0") - e("uvlo0")) * l)
                                        wu1 = (e("uvlo1")
                                               + (e("uvhi1") - e("uvlo1")) * l)
                                        u = wu1 / wu0
                                        iu = jnp.where(jnp.isnan(u), 0,
                                                       jnp.floor(u)
                                                       .astype(jnp.int32))
                                        cl = e("base_col") + jnp.clip(
                                            iu, 0, e("len_m1"))
                                        if MCC:  # select the inline colors
                                            val = jnp.zeros_like(cl)
                                            for kk in range(MCC):
                                                val = jnp.where(
                                                    cl == kk,
                                                    stk_r[0, 8 + MAXR + kk]
                                                    [g_row][None, :], val)
                                        else:
                                            val = cl
                                        return val

                                    if slot_gate:
                                        # run spans stack in pixel space, so a
                                        # tile is typically covered by ONE
                                        # slot: skip the divide-heavy span
                                        # math for slots with no coverage here
                                        # (in_s all-false => val is unread)
                                        val = jax.lax.cond(
                                            jnp.any(in_s), side_val,
                                            lambda: jnp.zeros_like(tile))
                                    else:
                                        val = side_val()
                                    chosen = jnp.where(in_s & ~claimed, val,
                                                       chosen)
                                    claimed = claimed | in_s
                                    chosen = jnp.where(
                                        in_c & ~claimed,
                                        jnp.broadcast_to(e("cap_col"),
                                                         tile.shape), chosen)
                                    claimed = claimed | in_c
                                do = claimed & (tile < 0)
                                raybuf_ref[g_row, pl.ds(w, WT), :] = jnp.where(
                                    do, chosen, tile)
                                return jnp.any(do, axis=0).astype(jnp.int32)

                            if walk_cond:
                                wrote_add = jax.lax.cond(
                                    anyc, busy_row,
                                    lambda: jnp.zeros((128,), jnp.int32))
                            else:
                                # kernel_walk_cond="off": tiles between the
                                # per-row bounds are usually covered (128
                                # lanes of spans per row), so the scf.if is
                                # pure Mosaic control overhead; an uncovered
                                # tile's busy_row is a no-op write-back
                                # (claimed stays false => do stays false)
                                wrote_add = busy_row()
                            return (w + WT, wr | wrote_add)

                        _, wr_g = jax.lax.while_loop(
                            wcond, wbody, (lo_g, jnp.zeros((128,), jnp.int32)))
                        wrote_rows.append(wr_g)
                    return wrote | jnp.stack(wrote_rows)

                run_done0 = jnp.zeros((BG, 128), jnp.int32)
                wrote0 = jnp.zeros((BG, 128), jnp.int32)
                sweep0 = (eb_min0, eb_max0, run_done0, nfpmin, nfpmax, fbmin, fbmax,
                          alive.astype(jnp.int32))

                if ABLATE == "nosweep":
                    wrote = wrote0
                    alive_i2 = alive.astype(jnp.int32)
                elif MAXR <= RB:
                    # shallow worlds: single unrolled sweep + one walk per cell
                    st = sweep0
                    slots = []
                    for k in range(MAXR):
                        st, prm = sweep_one(k, st)
                        slots.append(prm)
                    wrote = merged_walk(slots, wrote0)
                    (_, _, _, nfpmin, nfpmax, fbmin, fbmax, alive_i2) = st
                else:
                    # ---- checkpoint sweep skip: a run strictly on the far
                    # side of the frustum window is never drawn and never
                    # breaks (draw needs ~above & ~below; brk fires on the
                    # NEAR side only), so its whole sweep_one contribution is
                    # the cursor move — and the cursor arithmetic is integer-
                    # valued (lengths x power-of-two LOD scales, all < 2^24),
                    # hence f32-EXACT: jumping the cursor to a precomputed
                    # cumulative-length checkpoint replays the sequential
                    # value bit-for-bit.  Pre-pass cost ~2 sweep_one steps of
                    # static VMEM reads; the win is every skipped RB block of
                    # full sweep geometry (mill: 45-run columns, windows mid-
                    # column — about half the sweep on the deep-RLE scenes).
                    if sweep_skip:
                        NCK = (MAXR - 1) // RB  # boundaries at RB, 2RB, ..
                        cum = jnp.zeros((BG, 128), jnp.int32)
                        best_k = jnp.zeros((BG, 128), jnp.int32)
                        for c in range(1, NCK + 1):
                            for j in range((c - 1) * RB, c * RB):
                                cum = cum + (stk_r[0, 8 + j] & 0xFFFF)
                            cursor = (cum * vshift).astype(jnp.float32)
                            if iteration_direction > 0:
                                # runs 0..cRB-1 all above the window <=> the
                                # deepest of them still ends above wbmax
                                ok = (WMY - cursor) > wbmax
                            else:
                                ok = cursor < wbmin
                            best_k = jnp.where(process & ok,
                                               jnp.int32(c * RB), best_k)
                        k_start = jnp.min(jnp.where(process, best_k,
                                                    jnp.int32(MAXR)))
                        # per-lane cursor at the SHARED k_start (lanes whose
                        # own checkpoint is deeper just sweep a few extra far-
                        # side runs; lanes with k_start > nruns are inert —
                        # their eb is never read under k_valid)
                        cum0 = jnp.zeros((BG, 128), jnp.int32)
                        for j in range(NCK * RB):
                            cum0 = cum0 + jnp.where(
                                j < k_start, stk_r[0, 8 + j] & 0xFFFF, 0)
                        cur0 = (cum0 * vshift).astype(jnp.float32)
                        if iteration_direction > 0:
                            sweep0 = (WMY - cur0, WMY - cur0) + sweep0[2:]
                        else:
                            sweep0 = (cur0, cur0) + sweep0[2:]
                    else:
                        k_start = jnp.int32(0)

                    def rb_cond(st):
                        k0 = st[0]
                        (_, _, run_done_i, _, _, _, _, alive_i2) = st[1]
                        return (k0 < MAXR) & jnp.any(
                            process & (alive_i2 != 0) & (k0 < nruns)
                            & (run_done_i == 0))

                    def rb_body(st):
                        k0, sweep_st, wrote = st
                        slots = []
                        for j in range(RB):
                            sweep_st, prm = sweep_one(k0 + j, sweep_st)
                            slots.append(prm)
                        wrote = merged_walk(slots, wrote)
                        return (k0 + RB, sweep_st, wrote)

                    _, sweep_st, wrote = jax.lax.while_loop(
                        rb_cond, rb_body, (k_start, sweep0, wrote0))
                    (_, _, _, nfpmin, nfpmax, fbmin, fbmax, alive_i2) = sweep_st

                fact = fact & (wrote == 0)
                nfpmin_o[...] = nfpmin
                nfpmax_o[...] = nfpmax
                fbmin_o[...] = fbmin
                fbmax_o[...] = fbmax
                fdmin_o[...] = fdmin
                fdmax_o[...] = fdmax
                factive_o[...] = fact.astype(jnp.int32)
                alive_o[...] = alive_i2

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("C", "MAXR", "BG", "P", "iteration_direction",
                     "world_max_y", "interpret", "MCC", "ablate", "rb_cap",
                     "solid_min_y", "solid_max_y", "sweep_skip", "slot_gate",
                     "walk_tile", "walk_cond"))
def rasterize_chunk(
    stacked,  # (C, 8 + MAXR + MCC, G, 128) int32: the per-cell field stack
              # [ids0, ids1, lod, valid, n_runs, color_off, cmin, cmax,
              #  runs..., inline colors...] (float fields bitcast)
    consts,  # dict of (G, 128): pb_p..pd_w (9), cam_y, cam_y_norm
    raybuf,  # (G, P, 128) int32
    state,  # dict of (G, 128): nfp_min, nfp_max, fb_min, fb_max, fdir_min,
            #                   fdir_max, f_active, alive (int32)
    C: int, MAXR: int, BG: int, P: int, iteration_direction: int,
    world_max_y: float, interpret: bool = False, MCC: int = 0,
    ablate: str = "", rb_cap: int = RB_CAP,
    solid_min_y: float | None = None, solid_max_y: float | None = None,
    sweep_skip: bool = True, slot_gate: bool = False, walk_tile: int = 8,
    walk_cond: bool = True,
):
    G = raybuf.shape[0]
    assert G % BG == 0, (G, BG)
    NF = 8 + MAXR + MCC
    assert stacked.shape == (C, NF, G, 128), (stacked.shape, C, NF, G)
    # grid: (ray blocks, cells) — cells minor, so the raybuffer + state blocks of
    # a ray block stay VMEM-resident across the whole c-sweep while the per-cell
    # stack block streams through ONE double-buffered DMA per step
    grid = (G // BG, C)

    kern = _make_kernel(C, MAXR, BG, P, iteration_direction, world_max_y,
                        MCC=MCC, ablate=ablate, rb_cap=rb_cap,
                        solid_min_y=solid_min_y, solid_max_y=solid_max_y,
                        sweep_skip=sweep_skip, slot_gate=slot_gate,
                        walk_tile=walk_tile, walk_cond=walk_cond)

    def bs_stk():  # (C, NF, G, 128) -> (1, NF, BG, 128) per-cell slice
        return pl.BlockSpec((1, NF, BG, 128), lambda i, c: (c, 0, i, 0),
                            memory_space=pltpu.VMEM)

    def bs_g():  # (G, 128) -> (BG, 128), resident across the c-sweep
        return pl.BlockSpec((BG, 128), lambda i, c: (i, 0),
                            memory_space=pltpu.VMEM)

    def bs_rb():  # (G, P, 128) -> (BG, P, 128), resident across the c-sweep
        return pl.BlockSpec((BG, P, 128), lambda i, c: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    state_keys = ("nfp_min", "nfp_max", "fb_min", "fb_max", "fdir_min",
                  "fdir_max", "f_active", "alive")
    inputs = [
        stacked,
        consts["pb_p"], consts["pb_n"], consts["pb_w"],
        consts["pt_p"], consts["pt_n"], consts["pt_w"],
        consts["pd_p"], consts["pd_n"], consts["pd_w"],
        consts["cam_y"], consts["cam_y_norm"],
        consts["orig_min"], consts["orig_max"],
        raybuf, *(state[k] for k in state_keys),
    ]
    in_specs = ([bs_stk()] + [bs_g()] * 13 + [bs_rb()] + [bs_g()] * 8)
    out_specs = [bs_rb()] + [bs_g()] * 8
    out_shape = [jax.ShapeDtypeStruct(raybuf.shape, raybuf.dtype)] + [
        jax.ShapeDtypeStruct((G, 128), state[k].dtype) for k in state_keys]

    # raybuf input (14) -> output 0; state inputs 15..22 -> outputs 1..8.
    # (interpret mode doesn't honor aliasing; the kernel's explicit copy-in keeps
    # it correct either way)
    aliases = {14: 0}
    for j in range(8):
        aliases[15 + j] = 1 + j
    kwargs = {} if interpret else {"input_output_aliases": aliases}

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        **kwargs,
    )(*inputs)
    raybuf_out = out[0]
    state_out = {k: out[1 + j] for j, k in enumerate(state_keys)}
    return raybuf_out, state_out
