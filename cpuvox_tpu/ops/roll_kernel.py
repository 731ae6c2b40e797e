"""Pallas TPU kernel for the content-independent DDA chunk roll.

The XLA roll (`render/raymarch._roll_chunk`, a lax.scan with unroll=4 over
~30 tiny elementwise ops on (R, 2) arrays) is launch-overhead-bound: each
fused sub-computation inside the scan body pays a fixed per-op device cost
that dwarfs the math at these shapes (PERF_NOTES trace table: ~15-18 ms per
1080p frame).  This kernel runs the whole chunk's steps inside ONE Pallas
program: rays on VPU lanes ((BGR, 128) register arrays, same layout as the
phase-1 rasterizer), a fori_loop over the chunk's C steps, and the per-step
visit record written to a VMEM-resident (C, 13, BGR, 128) block.

Bit-exactness: every operation in the roll is individually exact or
deterministically rounded with NO fusion ambiguity — integer adds/shifts/
masks, f32 adds/subs, multiplies by exact powers of two, min/max/compares.
There is no a*b+c shape anywhere, so XLA contraction (the usual TPU
divergence source, PERF_NOTES 9) cannot apply; the kernel replays
`_roll_chunk`'s semantics (ExecuteRay:235-245,613-615 — lod switch -> visit
-> step) bit-for-bit, including the PRE-switch snapshot that rides the visit
list for the gated march's busy-ray rewind.

Visit field order in the stacked output (f32 fields bitcast to int32):
  [0] pos_x   [1] pos_z   [2] ids0   [3] ids1   [4] lod   [5] valid
  [6] pre_pos_x [7] pre_pos_z [8] pre_tmax_x [9] pre_tmax_z
  [10] pre_ids0 [11] pre_ids1 [12] pre_lod
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NVF = 13  # visit fields per step (see module docstring)


def _make_kernel(C, BGR, X, Z, NLD):
    def kernel(aux_r, dirx_r, dirz_r,
               posx_i, posz_i, tmx_i, tmz_i, tdx_i, tdz_i, spx_i, spz_i,
               i0_i, i1_i, lod_i, alive_i,
               vis_o, posx_o, posz_o, tmx_o, tmz_o, tdx_o, tdz_o, spx_o,
               spz_o, i0_o, i1_o, lod_o, alive_o):
        dirx = dirx_r[...]
        dirz = dirz_r[...]
        far = aux_r[7][None, :]

        def lut(idx):
            # _small_lut on the aux rows: table[k] broadcast over sublanes
            out = jnp.broadcast_to(aux_r[0][None, :], idx.shape)
            for k in range(1, NLD):
                out = jnp.where(idx == k, aux_r[k][None, :], out)
            return out

        def step(c, st):
            (posx, posz, tmx, tmz, tdx, tdz, spx, spz, i0, i1, lod,
             alive) = st
            alive_b = alive != 0
            # pre-switch snapshot (rewind anchor)
            p_posx, p_posz, p_tmx, p_tmz = posx, posz, tmx, tmz
            p_i0, p_i1, p_lod = i0, i1, lod

            ldist = lut(jnp.clip(lod, 0, NLD - 1))
            switch = alive_b & (i0 >= ldist)

            # NextLOD (SegmentDDAData.cs:31-73)
            vsize = jnp.left_shift(1, lod).astype(jnp.int32)
            mask2 = 2 * vsize - 1
            rem_x = posx & mask2
            rem_z = posz & mask2
            tpx = tmx - tdx
            tpz = tmz - tdz
            low_x = rem_x < vsize
            low_z = rem_z < vsize
            inc_x = (dirx >= 0) == low_x
            inc_z = (dirz >= 0) == low_z
            ntmx = jnp.where(inc_x, tmx + tdx, tmx)
            ntmz = jnp.where(inc_z, tmz + tdz, tmz)
            ntpx = jnp.where(~inc_x, tpx - tdx, tpx)
            ntpz = jnp.where(~inc_z, tpz - tdz, tpz)
            ni0 = jnp.maximum(ntpx, ntpz)
            ni1 = jnp.minimum(ntmx, ntmz)

            posx = jnp.where(switch, posx - rem_x, posx)
            posz = jnp.where(switch, posz - rem_z, posz)
            tmx = jnp.where(switch, ntmx, tmx)
            tmz = jnp.where(switch, ntmz, tmz)
            tdx = jnp.where(switch, tdx * 2.0, tdx)
            tdz = jnp.where(switch, tdz * 2.0, tdz)
            spx = jnp.where(switch, spx * 2, spx)
            spz = jnp.where(switch, spz * 2, spz)
            i0 = jnp.where(switch, ni0, i0)
            i1 = jnp.where(switch, ni1, i1)
            lod = jnp.where(switch, lod + 1, lod)

            in_bounds = ((posx >= 0) & (posx < X) & (posz >= 0) & (posz < Z))
            valid = alive_b & in_bounds
            alive_b = valid

            bc = pltpu.bitcast
            for f, v in enumerate((
                    posx, posz, bc(i0, jnp.int32), bc(i1, jnp.int32), lod,
                    valid.astype(jnp.int32), p_posx, p_posz,
                    bc(p_tmx, jnp.int32), bc(p_tmz, jnp.int32),
                    bc(p_i0, jnp.int32), bc(p_i1, jnp.int32), p_lod)):
                vis_o[c, f] = v

            # Step (SegmentDDAData.cs:135-150).  NOTE the adds mirror the XLA
            # form `tmax + where(bump, tdelta, 0.0)` exactly: x + 0.0 maps
            # -0.0 to +0.0, so `where(bump, tmax+tdelta, tmax)` would NOT be
            # bit-identical on -0.0 tmax entries (axis-parallel rays)
            x_first = tmx < tmz
            crossed = jnp.where(x_first, tmx, tmz)
            zero = jnp.zeros_like(tdx)
            stmx = tmx + jnp.where(x_first, tdx, zero)
            stmz = tmz + jnp.where(x_first, zero, tdz)
            sposx = posx + jnp.where(x_first, spx, 0)
            sposz = posz + jnp.where(x_first, 0, spz)
            si1 = jnp.minimum(stmx, stmz)
            hit_far = crossed >= far

            posx = jnp.where(alive_b, sposx, posx)
            posz = jnp.where(alive_b, sposz, posz)
            tmx = jnp.where(alive_b, stmx, tmx)
            tmz = jnp.where(alive_b, stmz, tmz)
            i0 = jnp.where(alive_b, crossed, i0)
            i1 = jnp.where(alive_b, si1, i1)
            alive_b = alive_b & ~hit_far
            return (posx, posz, tmx, tmz, tdx, tdz, spx, spz, i0, i1, lod,
                    alive_b.astype(jnp.int32))

        st = (posx_i[...], posz_i[...], tmx_i[...], tmz_i[...], tdx_i[...],
              tdz_i[...], spx_i[...], spz_i[...], i0_i[...], i1_i[...],
              lod_i[...], alive_i[...])
        st = jax.lax.fori_loop(0, C, step, st)
        for ref, v in zip((posx_o, posz_o, tmx_o, tmz_o, tdx_o, tdz_o, spx_o,
                           spz_o, i0_o, i1_o, lod_o, alive_o), st):
            ref[...] = v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("C", "X", "Z", "NLD", "BGR", "interpret"))
def roll_chunk_pallas(state, aux, dirs_x, dirs_z,
                      C: int, X: int, Z: int, NLD: int, BGR: int = 8,
                      interpret: bool = False):
    """Roll every ray C cells on device.

    state: dict of 12 (G, 128) arrays — pos_x/z i32, tmax_x/z f32,
    tdelta_x/z f32, stp_x/z i32, ids0/ids1 f32, lod i32, alive i32.
    aux: (8, 128) f32 — rows 0..NLD-1 broadcast lod_distances, row 7
    broadcast far_clip.  Returns (visits (C, NVF, G, 128) i32 stack,
    state_out same dict shape).
    """
    keys = ("pos_x", "pos_z", "tmax_x", "tmax_z", "tdelta_x", "tdelta_z",
            "stp_x", "stp_z", "ids0", "ids1", "lod", "alive")
    G = state["pos_x"].shape[0]
    while G % BGR != 0:  # small stage widths: shrink the row block
        BGR //= 2
    grid = (G // BGR,)

    def bs_aux():
        return pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def bs_g():
        return pl.BlockSpec((BGR, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def bs_vis():
        return pl.BlockSpec((C, NVF, BGR, 128), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)

    kern = _make_kernel(C, BGR, X, Z, NLD)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs_aux(), bs_g(), bs_g()] + [bs_g()] * 12,
        out_specs=[bs_vis()] + [bs_g()] * 12,
        out_shape=[jax.ShapeDtypeStruct((C, NVF, G, 128), jnp.int32)] + [
            jax.ShapeDtypeStruct((G, 128), state[k].dtype) for k in keys],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(aux, dirs_x, dirs_z, *(state[k] for k in keys))
    visits = out[0]
    state_out = {k: out[1 + j] for j, k in enumerate(keys)}
    return visits, state_out
