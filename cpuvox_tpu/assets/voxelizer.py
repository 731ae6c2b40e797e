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
    counts = span[:, 0] * span[:, 1] * span[:, 2]
    counts[~valid_tri] = 0

    out_xz, out_y, out_r, out_g, out_b = [], [], [], [], []

    # chunk triangles so a chunk's total candidate cells stays bounded
    order = np.arange(n_tris)
    csum = np.cumsum(counts)
    start = 0
    while start < n_tris:
        target = (csum[start - 1] if start else 0) + chunk_candidates
        end = int(np.searchsorted(csum, target)) + 1
        end = min(max(end, start + 1), n_tris)
        sel = order[start:end]
        sel = sel[counts[sel] > 0]
        start = end
        if sel.size == 0:
            continue

        t_counts = counts[sel]
        tri_of = np.repeat(sel, t_counts)
        offs = np.cumsum(t_counts) - t_counts
        within = np.arange(t_counts.sum(), dtype=np.int64) - np.repeat(offs, t_counts)
        # reference loop order: x outer, z mid, y inner (VoxelizerHelper.cs:74-76)
        sy = span[tri_of, 1]
        sz = span[tri_of, 2]
        iy = within % sy
        iz = (within // sy) % sz
        ix = within // (sy * sz)
        cx = mini[tri_of, 0] + ix
        cy = mini[tri_of, 1] + iy
        cz = mini[tri_of, 2] + iz

        center = np.stack([cx, cy, cz], axis=-1).astype(F) + F(0.5)
        an, bn, cn = ad[tri_of], bd[tri_of], cd[tri_of]
        nrm = normal[tri_of]
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
