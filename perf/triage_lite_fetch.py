"""Localize the TPU-only adaptive-lite divergence: compare the LITE row
unpack against the FULL record fetch for every nonempty column that fits the
tier, as pure XLA array programs (no Pallas, no sort, no march) on the current
backend.  If these differ on TPU but not CPU, the bug is in the lite fetch
lowering; if they match, the bug is in the group/stop/rewind interaction.

Usage: python perf/triage_lite_fetch.py [scene] [fwd|rev|both]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bench import build_world
from cpuvox_tpu.render.device import REC_META, build_device_world, \
    packed_run_words

scene = sys.argv[1] if len(sys.argv) > 1 else "mill1024"
which = sys.argv[2] if len(sys.argv) > 2 else "both"

lods = build_world(scene)
dw = build_device_world(lods)
assert dw.lite_runs > 0, "no lite tier on this world"
LR = dw.lite_runs
LW = (LR + 1) // 2
MAXR = dw.max_runs
rwords = packed_run_words(MAXR, 0)
print(f"{scene}: max_runs={MAXR} lite tier={LR} rwords={rwords} "
      f"backend={jax.default_backend()}", flush=True)

n_runs_all = np.asarray(dw.rec_fwd[:, 0])
fit = np.nonzero((n_runs_all > 0) & (n_runs_all <= LR))[0]
print(f"{fit.shape[0]} columns fit the tier "
      f"(of {int((n_runs_all > 0).sum())} nonempty)", flush=True)


def full_unpack(rec, direction):
    n_runs = rec[:, 0]
    words = rec[:, REC_META:REC_META + rwords]
    lo = words & 0xFFFF
    hi = jax.lax.shift_right_logical(words, 16)
    halves = jnp.stack([lo, hi], axis=-1).reshape(
        words.shape[:-1] + (2 * rwords,))[..., :MAXR]
    length = halves & 0x7FFF
    air = (halves & 0x8000) != 0
    solid_len = jnp.where(air, 0, length)
    cum = jnp.cumsum(solid_len, axis=-1)
    cum_excl = cum - solid_len
    if direction > 0:
        cidx = cum_excl
    else:
        cidx = cum[..., -1:] - cum_excl - length
    runs_k = jnp.where(air, jnp.int32(-1 << 16) | length,
                       (cidx << 16) | length)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, runs_k.shape, runs_k.ndim - 1)
    runs_k = jnp.where(k_iota < n_runs[:, None], runs_k, 0)
    return n_runs, rec[:, 1], rec[:, 2], rec[:, 3], runs_k


def lite_unpack(lrec, direction):
    slot0 = lrec[:, 0]
    n_l = slot0 & 0xFF
    tot = jax.lax.shift_right_logical(slot0, 8)
    words = lrec[:, 4:4 + LW]
    lo = words & 0xFFFF
    hi = jax.lax.shift_right_logical(words, 16)
    halves = jnp.stack([lo, hi], axis=-1).reshape(
        words.shape[:-1] + (2 * LW,))[..., :LR]
    length = halves & 0x7FFF
    air = (halves & 0x8000) != 0
    solid_len = jnp.where(air, 0, length)
    cum = jnp.cumsum(solid_len, axis=-1)
    cum_excl = cum - solid_len
    if direction > 0:
        cidx = cum_excl
    else:
        cidx = tot[:, None] - cum_excl - length
    runs_l = jnp.where(air, jnp.int32(-1 << 16) | length,
                       (cidx << 16) | length)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, runs_l.shape, runs_l.ndim - 1)
    runs_l = jnp.where(k_iota < n_l[:, None], runs_l, 0)
    runs_k = jnp.concatenate(
        [runs_l, jnp.zeros((lrec.shape[0], MAXR - LR), jnp.int32)], axis=-1)
    return n_l, lrec[:, 1], lrec[:, 2], lrec[:, 3], runs_k


# deep columns: the kernel keeps the LITE row's color_off/cmin/cmax and takes
# n_runs/runs from the full-record fallback fetch — so the lite row's meta
# must agree with the full record for DEEP columns too
deep_cols = np.nonzero(n_runs_all > LR)[0]
print(f"{deep_cols.shape[0]} deep columns (> tier)", flush=True)
for direction, name in ((1, "fwd"), (-1, "rev")):
    rec_src = np.asarray(dw.rec_fwd if direction > 0 else dw.rec_rev)
    lite_src = np.asarray(dw.lite_fwd if direction > 0 else dw.lite_rev)
    rec_d = rec_src[deep_cols]
    lrec_d = lite_src[deep_cols]
    nl = lrec_d[:, 0] & 0xFF
    print(f"{name} deep n_runs: {int((nl != rec_d[:, 0]).sum())} differ; "
          f"color_off: {int((lrec_d[:, 1] != rec_d[:, 1]).sum())}; "
          f"cmin: {int((lrec_d[:, 2] != rec_d[:, 2]).sum())}; "
          f"cmax: {int((lrec_d[:, 3] != rec_d[:, 3]).sum())}", flush=True)

for direction, name in ((1, "fwd"), (-1, "rev")):
    if which != "both" and which != name:
        continue
    rec_src = dw.rec_fwd if direction > 0 else dw.rec_rev
    lite_src = dw.lite_fwd if direction > 0 else dw.lite_rev
    rec = jnp.asarray(rec_src)[jnp.asarray(fit)]
    lrec = jnp.asarray(lite_src)[jnp.asarray(fit)]
    f = jax.jit(full_unpack, static_argnames="direction")(rec, direction)
    l = jax.jit(lite_unpack, static_argnames="direction")(lrec, direction)
    labels = ("n_runs", "color_off", "cmin", "cmax", "runs_k")
    for lab, a, b in zip(labels, f, l):
        a = np.asarray(a)
        b = np.asarray(b)
        bad = ~np.all(a == b, axis=tuple(range(1, a.ndim)))
        n_bad = int(bad.sum())
        print(f"{name} {lab}: {n_bad} columns differ", flush=True)
        if n_bad:
            i = int(np.nonzero(bad)[0][0])
            print(f"   first: col {int(fit[i])} full={a[i]} lite={b[i]}",
                  flush=True)
