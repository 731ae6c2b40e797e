"""World-sharded rendering: LOD-tiered sharding with a camera-local tile window.

Implements DESIGN_WORLD_SHARD.md (SURVEY §5 "long-context analog"; VERDICT r2
item 9).  The reference keeps its whole World in host RAM and shares it across
render jobs (World.cs); there is nothing to port — this is new TPU-native
design for worlds larger than one chip's HBM:

- **LOD0 is the bulk of world bytes** (mill2048: >93%).  It is sharded by XZ
  tiles of T x T columns, striped round-robin over the mesh's ``world`` axis
  (owner = tile_id % n_chips) so the camera's near field never lands on a
  single owner.
- **LOD >= 1 is tiny (<7%) and replicated.**
- **LOD0 cells are only ever visited near the camera**: the march switches a
  ray to LOD1 once its entry param reaches ``lod_distances[0]``
  (raymarch._roll_chunk; ExecuteRay's lod ladder, DrawSegmentRayJob.cs:613-615),
  and ray params measure Euclidean XZ distance from the camera (unit ``dirs``).
  So a camera-centered square WINDOW of tiles with half-extent
  ``ceil((lod_distances[0] + 2) / T)`` provably contains every LOD0 visit.
- Per frame, a jitted ``shard_map`` exchange psum-gathers the window's tiles
  from their owners into a replicated **active world**; the unchanged
  single-chip render program addresses LOD0 through pure window arithmetic
  (raymarch._cell_index — slot = window-relative tile coords; no extra gather
  rides the hot path).  Off-window LOD0 cells resolve to an all-empty sentinel
  tile; the window guarantee above means no visited cell ever lands there.
- The window is memoized by its (tx0, tz0) corner — a static camera re-renders
  with zero exchange traffic; motion re-fetches one window per tile crossing
  (DESIGN_WORLD_SHARD.md budgets ~15 MB / ~0.3 ms per crossing on ICI).

Scope (validated bit-exact vs the replicated renderer on the 8-device CPU
mesh, tests/test_world_shard.py): inline-record worlds only — max_runs <=
INLINE_MAX_RUNS (deep-record worlds raise in build()) and ARGB record mode
raises in ShardedRenderer (both documented capability cliffs).  The
occupancy-tile AND adaptive-lite layers ARE owner-striped and window-exchanged
alongside the records (build() `extra`), so the gated two-stage march and the
lite fast path run against a sharded world just like a replicated one.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpuvox_tpu.render import camera as cm
from cpuvox_tpu.render import raymarch
from cpuvox_tpu.render.device import build_device_world
from cpuvox_tpu.render.frame import Renderer
from cpuvox_tpu.world.rle import WorldLOD


@dataclasses.dataclass
class _ActiveWorldMeta:
    """The DeviceWorld face the Renderer needs (march params, capacities)."""

    dims: tuple[int, int, int]
    lod_levels: int
    max_runs: int
    lod0_voxels: int
    max_col_colors: int = 0
    lite_runs: int = 0
    occ_tiles: object = None  # non-None enables the occupancy auto policy
    empty_frac: float = 0.0
    # solid-content Y bounds for the solid-bound ray kill (None = disabled);
    # window arithmetic is world-global, so the replicated bounds stay exact
    # under tile striping
    solid_min_y: float | None = None
    solid_max_y: float | None = None


@dataclasses.dataclass
class ShardedWorld:
    """LOD0 tiles owner-striped over the mesh; coarse LODs replicated."""

    mesh: Mesh
    dims: tuple[int, int, int]
    lod_levels: int
    max_runs: int
    lod0_voxels: int
    tl: int  # log2 tile side (columns)
    nt_x: int
    nt_z: int
    cb: int  # per-tile color-block capacity
    rec_w: int  # record row width (int32)
    # owner-striped LOD0 tiles, sharded P('world') on axis 0 (nt_pad rows);
    # row t%nc*ntl + t//nc holds tile t.  Record slot 1 = TILE-LOCAL color off.
    owned_fwd: jax.Array  # (nt_pad, T*T, rec_w) int32
    owned_rev: jax.Array
    owned_colors: jax.Array  # (nt_pad, cb) int32 (uint32 bits)
    # replicated coarse chain (original concat layout minus the LOD0 prefix)
    coarse_fwd: np.ndarray  # (coarse_cols, rec_w) int32, color_off 0-based
    coarse_rev: np.ndarray
    coarse_colors: np.ndarray  # uint32, WITHOUT the skybox slot
    col_base: np.ndarray  # int32 [8] original concat bases
    grid_z: np.ndarray
    skybox: np.uint32
    # occupancy tiles (device.py build_occ_tiles), same striping: (T/16)*(T/8)
    # 8-int rows per world tile — the gated two-stage march works sharded
    owned_occ: jax.Array | None = None  # (nt_pad, T^2/128, 8) int32
    coarse_occ: np.ndarray | None = None
    tile_base: np.ndarray | None = None
    tile_gz: np.ndarray | None = None
    empty_frac: float = 0.0
    # adaptive lite records (device.py _pick_lite_tier), same striping
    owned_lite_fwd: jax.Array | None = None  # (nt_pad, T*T, lite_w) int32
    owned_lite_rev: jax.Array | None = None
    coarse_lite_fwd: np.ndarray | None = None
    coarse_lite_rev: np.ndarray | None = None
    lite_runs: int = 0
    # solid-content Y bounds (device.py): world-global, striping-invariant
    solid_min_y: float = 0.0
    solid_max_y: float = 0.0

    @property
    def n_chips(self) -> int:
        return self.mesh.devices.size

    @classmethod
    def build(cls, lods: list[WorldLOD], mesh: Mesh, tile_cols: int = 256,
              skybox_rgb: tuple[int, int, int] = (25, 25, 25)
              ) -> "ShardedWorld":
        dw = build_device_world(lods, skybox_rgb=skybox_rgb)
        if dw.rec_fwd is None:
            raise ValueError("world sharding needs the inline record layout "
                             f"(max_runs {dw.max_runs} > INLINE limit)")
        x0, z0 = lods[0].grid_dims
        t = min(tile_cols, x0, z0)
        if t & (t - 1) or x0 % t or z0 % t:
            raise ValueError(f"tile_cols {t} must be a power of two dividing "
                             f"the LOD0 grid {x0}x{z0}")
        tl = t.bit_length() - 1
        nt_x, nt_z = x0 // t, z0 // t
        nt = nt_x * nt_z
        n0 = x0 * z0
        rec_w = dw.rec_fwd.shape[1]

        def tile_order(rows2d):  # (n0, ...) column-major -> (nt, T*T, ...)
            r = rows2d.reshape((nt_x, t, nt_z, t) + rows2d.shape[1:])
            r = np.moveaxis(r, 2, 1)  # (nt_x, nt_z, T, T, ...)
            return r.reshape((nt, t * t) + rows2d.shape[1:])

        fine_fwd = tile_order(dw.rec_fwd[:n0]).copy()
        fine_rev = tile_order(dw.rec_rev[:n0]).copy()

        # per-column solid-voxel counts -> per-tile color blocks + local offs
        runs0 = lods[0].runs
        solid = np.where(runs0 >= 0, runs0 & 0xFFFF, 0).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(solid)])
        off64 = lods[0].col_offset.astype(np.int64)
        cnt = csum[off64 + lods[0].col_runs] - csum[off64]  # (n0,)
        src = lods[0].col_color_offset.astype(np.int64) + 1  # into dw.colors
        cnt_t = tile_order(cnt.reshape(-1, 1))[..., 0]  # (nt, T*T)
        src_t = tile_order(src.reshape(-1, 1))[..., 0]
        loc = np.cumsum(cnt_t, axis=1) - cnt_t  # tile-local exclusive offsets
        cb = max(int((loc[:, -1] + cnt_t[:, -1]).max(initial=0)), 1)
        total = int(cnt_t.sum())
        assert total == int(lods[0].colors.shape[0]), (total,
                                                       lods[0].colors.shape)
        colors_t = np.zeros((nt, cb), np.uint32)
        flat_cnt = cnt_t.ravel()
        rep = np.repeat(np.arange(nt * t * t, dtype=np.int64), flat_cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(flat_cnt) - flat_cnt, flat_cnt)
        colors_t[rep // (t * t), loc.ravel()[rep] + within] = \
            dw.colors[src_t.ravel()[rep] + within]
        fine_fwd[:, :, 1] = loc.astype(np.int32)  # slot 1 -> tile-local
        fine_rev[:, :, 1] = loc.astype(np.int32)

        nc = mesh.devices.size
        ntl = -(-nt // nc)
        nt_pad = ntl * nc
        g_fwd = np.zeros((nt_pad, t * t, rec_w), np.int32)
        g_rev = np.zeros_like(g_fwd)
        g_col = np.zeros((nt_pad, cb), np.uint32)
        tid = np.arange(nt)
        grow = (tid % nc) * ntl + tid // nc  # owner-striped global row
        g_fwd[grow], g_rev[grow], g_col[grow] = fine_fwd, fine_rev, colors_t

        shard = NamedSharding(mesh, P("world"))
        coarse_fwd = dw.rec_fwd[n0:].copy()
        coarse_rev = dw.rec_rev[n0:].copy()
        n0c = int(lods[0].colors.shape[0])
        # coarse color offsets 0-based into coarse_colors (rebased per window)
        coarse_fwd[:, 1] -= 1 + n0c
        coarse_rev[:, 1] -= 1 + n0c
        extra = {"solid_min_y": dw.solid_min_y, "solid_max_y": dw.solid_max_y}
        if t >= 16 and dw.occ_tiles is not None:
            # occupancy tiles (16x8 columns per row) nest inside world tiles;
            # stripe LOD0's rows the same way so the gated march works sharded
            tb = dw.tile_base
            occ0 = dw.occ_tiles[tb[0]:tb[1]]  # (gx/16 * gz/8, 8)
            r = occ0.reshape(nt_x, t // 16, nt_z, t // 8, 8)
            occ_t = np.moveaxis(r, 2, 1).reshape(nt, (t * t) // 128, 8)
            g_occ = np.zeros((nt_pad,) + occ_t.shape[1:], np.int32)
            g_occ[grow] = occ_t
            extra.update(
                owned_occ=jax.device_put(g_occ, shard),
                coarse_occ=dw.occ_tiles[tb[1]:].copy(),
                tile_base=tb.copy(), tile_gz=dw.tile_gz.copy(),
                empty_frac=dw.empty_frac)
        if dw.lite_fwd is not None and dw.max_col_colors == 0:
            lf = tile_order(dw.lite_fwd[:n0]).copy()
            lr = tile_order(dw.lite_rev[:n0]).copy()
            lf[:, :, 1] = loc.astype(np.int32)  # slot 1 -> tile-local
            lr[:, :, 1] = loc.astype(np.int32)
            g_lf = np.zeros((nt_pad,) + lf.shape[1:], np.int32)
            g_lr = np.zeros_like(g_lf)
            g_lf[grow], g_lr[grow] = lf, lr
            clf = dw.lite_fwd[n0:].copy()
            clr = dw.lite_rev[n0:].copy()
            clf[:, 1] -= 1 + n0c
            clr[:, 1] -= 1 + n0c
            extra.update(owned_lite_fwd=jax.device_put(g_lf, shard),
                         owned_lite_rev=jax.device_put(g_lr, shard),
                         coarse_lite_fwd=clf, coarse_lite_rev=clr,
                         lite_runs=dw.lite_runs)
        return cls(
            mesh=mesh, dims=dw.dims, lod_levels=dw.lod_levels,
            max_runs=dw.max_runs, lod0_voxels=dw.lod0_voxels,
            tl=tl, nt_x=nt_x, nt_z=nt_z, cb=cb, rec_w=rec_w,
            owned_fwd=jax.device_put(g_fwd, shard),
            owned_rev=jax.device_put(g_rev, shard),
            owned_colors=jax.device_put(g_col.view(np.int32), shard),
            coarse_fwd=coarse_fwd, coarse_rev=coarse_rev,
            coarse_colors=dw.colors[1 + n0c:].copy(),
            col_base=dw.col_base.copy(), grid_z=dw.grid_z.copy(),
            skybox=np.uint32(dw.colors[0]), **extra)

    def make_exchange(self):
        """Jitted window fetch: psum-gather the window's tiles from their
        owners (one collective, W^2 x T^2 rows — DESIGN_WORLD_SHARD.md's
        'gather-by-owner' step), then rebase color offsets to active-layout
        slots.  Valid tile ids >= 0; -1 (off-world) contributes zeros, same
        bits as the sentinel tile."""
        nc, ntl = self.n_chips, self.owned_fwd.shape[0] // self.n_chips
        mesh, cb = self.mesh, self.cb

        def shard_fn(owned, tids):
            ax = jax.lax.axis_index("world").astype(jnp.int32)
            valid = tids >= 0
            tt = jnp.maximum(tids, 0)
            sel = valid & (tt % nc == ax)
            lidx = jnp.clip(tt // nc, 0, ntl - 1)

            def pick(o):
                sb = sel.reshape(sel.shape + (1,) * (o.ndim - 1))
                return jax.lax.psum(jnp.where(sb, o[lidx], 0), "world")

            return tuple(pick(o) for o in owned)

        def exchange(owned, rebase, tids):
            """owned: dict name -> striped array; rebase: names whose record
            slot 1 (color_off, tile-local) shifts to its active color block."""
            names = tuple(owned)
            fetch = jax.shard_map(
                shard_fn, mesh=mesh,
                in_specs=(tuple(P("world") for _ in names), P()),
                out_specs=tuple(P() for _ in names))
            got = dict(zip(names, fetch(tuple(owned.values()), tids)))
            w2 = tids.shape[0]
            base = 1 + jnp.arange(w2, dtype=jnp.int32) * cb  # [0] = skybox
            for k in rebase:
                add = jnp.zeros((w2, 1, got[k].shape[-1]), jnp.int32
                                ).at[..., 1].set(base[:, None])
                got[k] = got[k] + add
            return got

        return jax.jit(exchange, static_argnames=("rebase",))


class ShardedRenderer:
    """Renderer over a world-sharded mesh: bit-identical to Renderer on the
    same LODs (tests/test_world_shard.py), with LOD0 storage striped across
    chips and only the camera-local window resident per chip.

    Pass ``ray_mesh`` (a parallel.mesh.RenderMesh over the same devices) to
    COMPOSE the two sharding modes: the window exchange already psums the
    camera-local active window to every chip, so the activated world is
    replicated and one camera's rays then shard over ALL chips through the
    Pallas fast path (parallel/mesh.render_frame_sharded) — one camera, one
    sharded world, N chips of compute (VERDICT r3 missing #4).  Without it,
    rendering runs on a single device against the active window (the round-3
    behavior)."""

    def __init__(self, lods: list[WorldLOD], mesh: Mesh, config=None,
                 tile_cols: int = 256, ray_mesh=None):
        from cpuvox_tpu.config import RenderConfig

        cfg = config or RenderConfig()
        if cfg.argb_records:
            raise ValueError("world sharding: ARGB record mode not supported")
        self.sw = ShardedWorld.build(lods, mesh, tile_cols=tile_cols,
                                     skybox_rgb=cfg.skybox_rgb)
        sw = self.sw
        meta = _ActiveWorldMeta(
            dims=sw.dims, lod_levels=sw.lod_levels, max_runs=sw.max_runs,
            lod0_voxels=sw.lod0_voxels, lite_runs=sw.lite_runs,
            occ_tiles=sw.owned_occ, empty_frac=sw.empty_frac,
            solid_min_y=sw.solid_min_y, solid_max_y=sw.solid_max_y)
        self.inner = Renderer(device_world=meta, config=cfg)
        self.ray_mesh = ray_mesh
        self._exchange = sw.make_exchange()
        self._window_key = None
        self._n_exchanges = 0

    def _window(self, cam: cm.Camera):
        """Camera-centered tile window (tx0, tz0, W): half-extent
        ceil((lod_distances[0] + 2) / T) tiles guarantees every LOD0 visit
        (entry param < lod_distances[0], +1 cell extent, +1 margin) is in
        window."""
        sw = self.sw
        t = 1 << sw.tl
        r0 = float(self.inner.lod_distances[0])
        ntm = max(sw.nt_x, sw.nt_z)
        if not math.isfinite(r0) or 2 * math.ceil((r0 + 2) / t) + 1 >= ntm:
            return 0, 0, ntm  # window covers the whole grid
        w = 2 * math.ceil((r0 + 2) / t) + 1
        tcx = int(np.floor(cam.position[0])) >> sw.tl
        tcz = int(np.floor(cam.position[2])) >> sw.tl
        return tcx - w // 2, tcz - w // 2, w

    def _activate(self, tx0: int, tz0: int, w: int):
        """Fetch the window and assemble the active WorldArrays (memoized by
        window corner — a static camera re-renders with zero exchange)."""
        if self._window_key == (tx0, tz0, w):
            return
        sw = self.sw
        t = 1 << sw.tl
        wi = np.arange(w)
        txs, tzs = tx0 + wi[:, None], tz0 + wi[None, :]
        valid = (txs >= 0) & (txs < sw.nt_x) & (tzs >= 0) & (tzs < sw.nt_z)
        tids = np.where(valid, txs * sw.nt_z + tzs, -1).astype(np.int32)
        owned = {"fwd": sw.owned_fwd, "rev": sw.owned_rev,
                 "colors": sw.owned_colors}
        rebase = ("fwd", "rev")
        if sw.owned_occ is not None:
            owned["occ"] = sw.owned_occ
        if sw.owned_lite_fwd is not None:
            owned["lite_fwd"] = sw.owned_lite_fwd
            owned["lite_rev"] = sw.owned_lite_rev
            rebase = rebase + ("lite_fwd", "lite_rev")
        got = self._exchange(owned, rebase, jnp.asarray(tids.ravel()))
        self._n_exchanges += 1
        if self.ray_mesh is not None:
            # composed mode: the active window is replicated over the RAY mesh
            # so one camera's rays shard over all chips (render() below)
            dev = NamedSharding(self.ray_mesh.mesh, P())
        else:
            dev = jax.devices()[0]
        w2 = w * w

        def fine_plus_coarse(key, coarse, cb_shift=True):
            """[window blocks, zero sentinel block, rebased coarse rows]."""
            blocks = jax.device_put(got[key], dev)
            sent = jnp.zeros((1,) + blocks.shape[1:], jnp.int32)
            fine = jnp.concatenate([blocks, sent]).reshape(
                -1, blocks.shape[-1])
            coarse = coarse.copy()
            if cb_shift:  # coarse colors follow the fine color blocks
                coarse[:, 1] += 1 + w2 * sw.cb
            return jnp.concatenate([fine, jnp.asarray(coarse)])

        colors = jnp.concatenate([
            jnp.asarray(np.array([sw.skybox], np.uint32)),
            jax.device_put(got["colors"], dev).view(jnp.uint32).reshape(-1),
            jnp.asarray(sw.coarse_colors)])

        col_base = sw.col_base.copy()
        n0 = sw.nt_x * sw.nt_z * t * t
        col_base[1:] = (w2 + 1) * t * t + (col_base[1:] - n0)
        col_base[0] = 0

        occ = tile_base = tile_gz = None
        if "occ" in got:
            occ = fine_plus_coarse("occ", sw.coarse_occ, cb_shift=False)
            tile_base = sw.tile_base.copy()
            tile_base[1:] = (w2 + 1) * ((t * t) // 128) + (
                sw.tile_base[1:] - sw.tile_base[1])
            tile_base[0] = 0
            tile_gz = jnp.asarray(sw.tile_gz)
            tile_base = jnp.asarray(tile_base)

        lite_f = lite_r = None
        if "lite_fwd" in got:
            lite_f = fine_plus_coarse("lite_fwd", sw.coarse_lite_fwd)
            lite_r = fine_plus_coarse("lite_rev", sw.coarse_lite_rev)

        self.inner._wa = raymarch.WorldArrays(
            col_base=jnp.asarray(col_base), grid_z=jnp.asarray(sw.grid_z),
            col_rec=None, runs=None, runs_rev=None, colors=colors,
            rec_fwd=fine_plus_coarse("fwd", sw.coarse_fwd),
            rec_rev=fine_plus_coarse("rev", sw.coarse_rev),
            lite_fwd=lite_f, lite_rev=lite_r,
            occ_tiles=occ, tile_base=tile_base, tile_gz=tile_gz,
            win=jnp.asarray([tx0, tz0, sw.tl, w], jnp.int32))
        self._window_key = (tx0, tz0, w)

    def render(self, cam: cm.Camera, **kw):
        cam2, _ = self.inner.setup_camera(cam)  # resolves lod_distances
        self._activate(*self._window(cam2))
        if self.ray_mesh is not None:
            from cpuvox_tpu.parallel.mesh import render_frame_sharded

            assert not kw, "composed sharded render: raybuffer views n/a"
            return render_frame_sharded(self.inner, cam, self.ray_mesh)
        return self.inner.render(cam, **kw)
