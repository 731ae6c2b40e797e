"""Batched triangle voxelization.

Reference: Assets/Code/VoxelizerHelper.cs:28-132 (Burst kernel, one triangle per call,
task-parallel over cores in WordBuilder.cs:41-96).  TPU-native substitution per
SURVEY.md §7: a data-parallel pass — triangles expand to candidate AABB cells in bulk,
then plane-distance / barycentric / material-alpha tests run as flat masked array ops.

Exact semantics preserved per triangle:
- dilate vertices by half a voxel along (vertex - centroid) (VoxelizerHelper.cs:52-57)
- candidate cells = clamped integer AABB, inclusive (:59-64)
- keep cell if |dot(center - a, n)| <= 0.5 (:77-81) and the plane-projected point has
  all barycentric coords in [0, 1] (:83-101)
- color = barycentric vertex-color blend (:103-108); if the triangle has a material,
  multiply by the point-sampled diffuse texel and drop the voxel when albedo.a < 1
  (WordBuilder.cs:76-84, the translucency non-goal)

Deviation: no 256K-voxel-per-buffer truncation (WordBuilder.cs:37, goto END :124-126) —
the batched pass has no fixed scratch buffer to overflow.

Candidate generation deviates from the reference's full 3-D AABB scan
(VoxelizerHelper.cs:74-76, O(volume) cells per triangle — quadratic blowup at
1024^3+): we rasterize the dilated triangle's 2-D AABB in its dominant-normal
plane and test only a 4-cell depth window around the plane per (u, v) cell.
Every cell with |plane distance| <= 0.5 lies inside that window (|n_d| >= 1/sqrt3
for the dominant axis, so the qualifying depth interval spans < 2 cells), and the
exact reference tests still run on every candidate — the OUTPUT set is identical,
the candidate set is O(area) instead of O(volume).
"""
from __future__ import annotations

import numpy as np

from .mesh import SimpleMesh

F = np.float32


def _normalize(v):
    n = np.sqrt(np.sum(v * v, axis=-1, keepdims=True, dtype=F))
    return v / n


def voxelize_mesh(
    mesh: SimpleMesh, dims: tuple[int, int, int], chunk_candidates: int = 4_000_000
):
    """Voxelize a (rescaled) mesh into a voxel soup.

    Returns (xz_index int64, y int64, (r, g, b) uint8 arrays) ready for
    world.build_lod_from_voxels.  xz_index = x * dims[2] + z (VoxelizerHelper.cs:114,
    with maxDimensions.z + 1 == dims.z).
    """
    max_dim = np.array(dims, np.int64) - 1
    tris = mesh.positions.reshape(-1, 3, 3).astype(F)
    tcolors = mesh.colors.reshape(-1, 3, 4).astype(F) / F(255.0)
    tuvs = mesh.uvs.reshape(-1, 3, 2).astype(F)
    tmat = mesh.material_index.reshape(-1, 3)[:, 0]
    n_tris = tris.shape[0]

    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    cross = np.cross(b - a, c - a).astype(F)
    cross_sq = np.sum(cross * cross, axis=-1, dtype=F)
    valid_tri = cross_sq != 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        normal = cross * (1.0 / np.sqrt(cross_sq))[:, None].astype(F)
        middle = (a + b + c) / F(3.0)
        ad = a + _normalize(a - middle) * F(0.5)
        bd = b + _normalize(b - middle) * F(0.5)
        cd = c + _normalize(c - middle) * F(0.5)

    minf = np.minimum(ad, np.minimum(bd, cd))
    maxf = np.maximum(ad, np.maximum(bd, cd))
    with np.errstate(invalid="ignore"):
        mini = np.clip(np.floor(minf), 0, max_dim).astype(np.int64)
        maxi = np.clip(np.ceil(maxf), 0, max_dim).astype(np.int64)
    span = np.where(valid_tri[:, None], maxi - mini + 1, 0)

    # dominant-axis 2-D rasterization (see module docstring): candidates are the
    # (u, v) AABB cells x a DW-cell depth window around the plane, not the full
    # 3-D AABB — O(area) instead of O(volume), identical output set
    DW = 4
    ar = np.arange(n_tris)
    with np.errstate(invalid="ignore"):
        d_ax = np.argmax(np.abs(np.where(np.isnan(normal), 0, normal)), axis=1)
    u_ax = (d_ax + 1) % 3
    v_ax = (d_ax + 2) % 3
    su = span[ar, u_ax]
    sv = span[ar, v_ax]
    counts = su * sv * DW
    counts[~valid_tri] = 0
    plane_off = np.sum(normal * ad, axis=-1, dtype=F)  # n . (dilated a)

    out_xz, out_y, out_r, out_g, out_b = [], [], [], [], []

    # process per dominant axis (static u/v/d columns — no two-array fancy
    # indexing) and chunk so a chunk's candidate count stays bounded
    for dax in range(3):
        uax = (dax + 1) % 3
        vax = (dax + 2) % 3
        gsel = np.nonzero(valid_tri & (d_ax == dax) & (counts > 0))[0]
        if gsel.size == 0:
            continue
        mini_u = mini[:, uax]
        mini_v = mini[:, vax]
        mini_d = mini[:, dax]
        maxi_d = maxi[:, dax]
        norm_u = normal[:, uax]
        norm_v = normal[:, vax]
        norm_d = normal[:, dax]

        csum = np.cumsum(counts[gsel])
        gstart = 0
        while gstart < gsel.size:
            target = (csum[gstart - 1] if gstart else 0) + chunk_candidates
            gend = int(np.searchsorted(csum, target)) + 1
            gend = min(max(gend, gstart + 1), gsel.size)
            sel = gsel[gstart:gend]
            gstart = gend

            t_counts = counts[sel]
            tri_of = np.repeat(sel, t_counts)
            offs = np.cumsum(t_counts) - t_counts
            within = (np.arange(t_counts.sum(), dtype=np.int64)
                      - np.repeat(offs, t_counts)).astype(np.int32)
            jd = within & (DW - 1)
            iu, iv = np.divmod(within >> 2, sv[tri_of].astype(np.int32))
            cu = mini_u[tri_of] + iu
            cv = mini_v[tri_of] + iv
            nu = norm_u[tri_of]
            nv = norm_v[tri_of]
            nd = norm_d[tri_of]
            # depth window: integers d with |n.(center - a)| <= 0.5 satisfy
            # d + 0.5 in [ (q - 0.5)/nd , (q + 0.5)/nd ] where q is the plane
            # offset minus the in-plane normal terms; DW=4 from dlo covers the
            # interval (length <= sqrt3 since |nd| >= 1/sqrt3) with fp margin
            q = plane_off[tri_of] - nu * (cu.astype(F) + F(0.5)) \
                - nv * (cv.astype(F) + F(0.5))
            with np.errstate(divide="ignore", invalid="ignore"):
                dc = q / nd
                half = F(0.5) / np.abs(nd)
                dlo = np.floor(dc - F(0.5) - half)
            dlo = np.where(np.isfinite(dlo), dlo, 0).astype(np.int64)
            cdp = dlo + jd
            # cheap prefilter (q-based plane distance with fp slack), then
            # compress before the exact reference tests.  dist_q is computed in
            # a different f32 op order than the exact full-3D dot below, so the
            # slack must scale with coordinate magnitude: each of the ~3 terms
            # per expression rounds at ~|coord| * 2^-24, so at max coordinate M
            # the two orderings can disagree by up to ~8 * eps * M (~2e-3 at
            # M=2048).  The exact test still runs on every candidate, so a wide
            # slack costs a few extra candidates and can never add voxels.
            slack = F(1e-3) + F(8.0) * np.float32(np.finfo(np.float32).eps) \
                * F(max(dims))
            dist_q = nd * (cdp.astype(F) + F(0.5)) - q
            pre = ((cdp >= mini_d[tri_of]) & (cdp <= maxi_d[tri_of])
                   & (np.abs(dist_q) <= F(0.5) + slack))
            cidx = np.nonzero(pre)[0]
            if cidx.size == 0:
                continue
            tri_of = tri_of[cidx]
            coords = np.empty((cidx.size, 3), np.int64)
            coords[:, uax] = cu[cidx]
            coords[:, vax] = cv[cidx]
            coords[:, dax] = cdp[cidx]
            cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]

            center = coords.astype(F) + F(0.5)
            an, bn, cn = ad[tri_of], bd[tri_of], cd[tri_of]
            nrm = normal[tri_of]
            # exact reference plane test (same fp op order as VoxelizerHelper
            # .cs:77-81: full 3-D dot on the candidate center)
            dist = np.sum((center - an) * nrm, axis=-1, dtype=F)
            keep = np.abs(dist) <= F(0.5)

            p = center - nrm * dist[:, None]
            p0 = bn - an
            p1 = cn - an
            p2 = p - an
            d00 = np.sum(p0 * p0, axis=-1, dtype=F)
            d01 = np.sum(p0 * p1, axis=-1, dtype=F)
            d11 = np.sum(p1 * p1, axis=-1, dtype=F)
            d20 = np.sum(p2 * p0, axis=-1, dtype=F)
            d21 = np.sum(p2 * p1, axis=-1, dtype=F)
            with np.errstate(divide="ignore", invalid="ignore"):
                denom = F(1.0) / (d00 * d11 - d01 * d01)
            bv = (d11 * d20 - d01 * d21) * denom
            bw = (d00 * d21 - d01 * d20) * denom
            bu = F(1.0) - bv - bw
            bary = np.stack([bu, bv, bw], axis=-1)
            with np.errstate(invalid="ignore"):
                keep &= ~np.any((bary < 0) | (bary > 1), axis=-1)
            keep &= ~np.isnan(bary).any(axis=-1)

            if not np.any(keep):
                continue
            tri_k = tri_of[keep]
            bary_k = bary[keep].astype(F)
            colors3 = tcolors[tri_k]  # (k, 3 verts, 4)
            col = np.einsum("kv,kvc->kc", bary_k, colors3[:, :, :3]).astype(F)

            mats = tmat[tri_k]
            alpha_keep = np.ones(tri_k.shape[0], bool)
            if mesh.materials and np.any(mats >= 0):
                uv = np.einsum("kv,kvc->kc", bary_k, tuvs[tri_k]).astype(F)
                for mi, mat in enumerate(mesh.materials):
                    m = mats == mi
                    if not np.any(m) or mat.diffuse is None:
                        continue
                    albedo = mat.sample_diffuse(uv[m])
                    alpha_keep[m] = albedo[:, 3] >= 1.0
                    col[m] = col[m] * albedo[:, :3]

            col = col[alpha_keep]
            tri_k = tri_k[alpha_keep]
            idx = np.nonzero(keep)[0][alpha_keep]

            byte_col = np.clip(np.round(col * F(255.0)), 0, 255).astype(np.uint8)
            out_xz.append(cx[idx] * dims[2] + cz[idx])
            out_y.append(cy[idx])
            out_r.append(byte_col[:, 0])
            out_g.append(byte_col[:, 1])
            out_b.append(byte_col[:, 2])

    if not out_xz:
        z = np.zeros(0, np.int64)
        u = np.zeros(0, np.uint8)
        return z, z.copy(), (u, u.copy(), u.copy())
    return (
        np.concatenate(out_xz),
        np.concatenate(out_y),
        (np.concatenate(out_r), np.concatenate(out_g), np.concatenate(out_b)),
    )
