"""Render configuration.

The reference keeps these as compile-time constants and immediate-mode GUI state
(SURVEY.md §5 "Config / flag system"; UnityManager.cs:25-33,381-403). Here they are a real
config dataclass.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static per-session render settings (changing them triggers re-jit)."""

    width: int = 1280
    height: int = 720

    # camera intrinsics (reference scene: FOV 85, near 0.05, far 1000;
    # Assets/Scenes/SampleScene.unity:176-178 — far is overwritten per-world by
    # UnityManager.SetupLods, :421-423)
    fov_y_deg: float = 85.0
    near_clip: float = 0.05

    # LOD policy (UnityManager.cs:42, :436 "lodError", World.cs REPEAT_WORLD clip scaling)
    lod_levels: int = 6
    lod_error: float = 1.0

    # render-resolution scale: phases 1+2 run at (width, height) * render_scale
    # through a scaled camera and the frame is upscaled (nearest) to native size
    # on device — the reference's "fake camera" resolution keys 4/5
    # (UnityManager.cs:35-36,57-63,179-182)
    render_scale: float = 1.0

    # march bounds for the fixed-shape TPU kernels (replaces the reference's unbounded
    # per-ray `while(true)`; DrawSegmentRayJob.cs:235).  0 = auto: the Renderer
    # resolves them per world — occupancy-gated sparse worlds take BIG chunks
    # (fewer per-chunk fixed costs; paired A/B: -29 ms p50 on mill2048, parity
    # on mill1024 — PERF_NOTES #19), dense worlds keep small chunks (the dense
    # fetch cost is per visited cell either way and big chunks only delay
    # live-ray compaction)
    max_march_chunks: int = 0
    chunk_steps: int = 0

    # skybox color, ARGB (DrawSegmentRayJob.cs:702 — (25, 25, 25))
    skybox_rgb: tuple[int, int, int] = (25, 25, 25)

    # phase-1 backend: "pallas" (TPU kernel, the fast path) or "xla" (the
    # full-width masked reference implementation)
    backend: str = "pallas"
    # ARGB records: inline each column's voxel colors into its record so phase 1
    # writes final pixels (no phase-2 color-resolve gather).  Off by default —
    # the wider march-gather rows cost more than the resolve saves on v5e.
    # Remeasured r5 with the wide-row discount known (64B rows ~1.44x a 32B
    # row): still LOSES +83 ms p50 on terrain2048 (1-7 wins,
    # perf/queue_out/ab_argb_terrain2048.log).
    argb_records: bool = False
    # occupancy-gated march ("auto" | "on" | "off"): gather one 16x8-column
    # occupancy-tile row per tile a ray crosses per chunk and fetch full column
    # records only for nonempty visits — the empty-column `continue` of
    # DrawSegmentRayJob.cs:251-256, rebuilt for the TPU gather cost model
    # (rows, not bytes).  "auto" enables it when >= 50% of LOD0 columns are
    # empty (mill/powerplant-class content); dense content keeps the one-stage
    # fetch, whose rows the gate could not reduce.
    occupancy_gate: str = "auto"
    # gated-group size: cells fetched + rasterized per chunk per ray on the
    # occupancy-gated path (rays with more gated cells in a chunk rewind to
    # the first unprocessed cell — output-exact for ANY value).  0 = auto
    gated_group_cells: int = 0
    # block-conditional gated fetch ("auto" | "on" | "off"): on the gated
    # path, run the per-group record fetch as a scan over 128-lane ray blocks
    # and SKIP the gather for blocks with zero gated cells this group
    # (lax.cond).  Slot modeling said win (78.7% utilization vs 22%,
    # PERF_NOTES #24) but the PAIRED on-TPU A/B says LOSE: +456 ms p50 on
    # mill1024 (0-8 wins, perf/queue_out r4) — the per-block lax.cond launch
    # overhead (~72 blocks x 8 groups x chunk) swamps the slot savings.
    # "auto" therefore resolves to OFF; the lever stays for future
    # hardware/content.
    block_fetch: str = "auto"
    # adaptive lite records ("auto" | "off"): on the gated path, fetch the
    # narrow lite row (meta + first `tier` runs) instead of the full record
    # for cells that fit the tier (device.py _pick_lite_tier).  DEFAULT OFF,
    # now for PERF, not correctness: the round-4 divergence was root-caused
    # to march-budget exhaustion (lite stops inflate while-iterations past
    # the old 3*max_dim/chunk+64 bound — PERF_NOTES 26) and is fixed by the
    # guaranteed gated budget + LD=2 deep slots; lite is bit-exact on TPU
    # (ab_lite spot frame: 0 px).  But the paired A/B says LOSE (+233 ms p50
    # on mill1024, 0-8 wins): each remaining stop re-rolls a whole chunk,
    # eating the ~30 ms/frame gather-slot saving.  Opt-in for future
    # content/hardware where the tier's deep rate is low.
    lite_records: str = "off"
    # gated-chunk drain groups: how many GK-cell groups drain a chunk before
    # the busy-ray rewind takes over (0 = auto: all C/GK groups when
    # block_fetch is on, else one group + rewind).  Explicit values A/B the
    # multi-group drain WITHOUT the per-block conds (PERF_NOTES 25)
    drain_groups: int = 0
    # solid-bound ray kill ("on" | "off"): retire a ray once its frozen
    # frustum window provably clears the world's solid-content Y bounds
    # (DeviceWorld.solid_min_y/solid_max_y) — with f_active held fdir is
    # frozen, so a monotone window that passed max(col_max) can never
    # intersect a column again; killing it changes no output pixel (the
    # unwritten tail becomes skybox exactly as a far-clip death would).
    # Strictly stronger than the reference's world-box retire
    # (DrawSegmentRayJob.cs:261-281) when content tops out below the box;
    # "off" is the A/B ablation leg.
    solid_kill: str = "on"
    # kernel run-block size: runs swept in registers per merged tile walk
    # inside the Pallas rasterizer (deep-RLE worlds sweep MAXR runs in blocks
    # of this size; bigger blocks merge more spans per walk at the cost of
    # register pressure).  0 = auto: 8 on occupancy-gated worlds (half the
    # rb_body iterations => half the merged walks; -28 ms p50 on mill2048 at
    # walk tile 16, 5-3 wins, ab_rb8_mill2048 r5 — at WT=8 it was a wash,
    # finding 29's control-overhead shift), else 4 (dense worlds with
    # MAXR <= 4 use the single unrolled sweep and never read this)
    kernel_run_block: int = 0
    # per-slot walk gate ("on" | "off"): inside the merged tile walk, skip a
    # run slot's divide-heavy side-span uv math for tiles it does not cover
    # (run spans stack in pixel space, so most tiles are covered by one of
    # the RB slots).  Output-exact (gated slots' values are unread).  OFF
    # until the paired TPU A/B says otherwise — in-kernel scf.if cost is
    # unmeasured and per-launch conds have burned us before (PERF_NOTES 25)
    kernel_slot_gate: str = "off"
    # walk tile height in raybuffer sublanes (8 | 16 | 32): taller tiles cut
    # walk-loop iterations (Mosaic control overhead) for long spans at the
    # cost of more minimum vector work per covered region.  0 = auto: 16 on
    # occupancy-GATED worlds when P % 16 == 0 (paired TPU A/Bs: -60 ms p50
    # mill2048, -141 ms layered2048, 0 px diffs) else 8 (dense terrain2048
    # measured +33 ms at 16; 32 was mill -27 / layered +51 — not escalated;
    # perf/queue_out/ab_walk*_r5 legs).  Output-exact at any setting
    kernel_walk_tile: int = 0
    # walk-tile coverage cond ("auto" | "on" | "off"): "on" wraps each walk
    # tile's IO + span math in a lax.cond on the cheap coverage test; "off"
    # runs the tile body unconditionally (a no-op write-back on uncovered
    # tiles).  With per-row walk bounds most tiles between lo and hi ARE
    # covered by some lane, so the scf.if is often pure Mosaic control
    # overhead: "off" measured -41 ms p50 on mill2048 at walk tile 16 (5-3
    # wins, ab_walkcond_mill2048 r5).  "auto" resolves OFF on occupancy-gated
    # worlds and ON on the dense path (unmeasured there; its kernel is ~28 ms
    # total).  Output-exact at any setting
    kernel_walk_cond: str = "auto"
    # DDA roll backend ("on" | "off"): "on" rolls each chunk as ONE Pallas
    # program instead of the lax.scan (ops/roll_kernel) — bit-identical visit
    # lists (the roll's ops have no rounding ambiguity); targets the scan's
    # per-iteration launch overhead.  CAUTION (r5 discovery): the r4-era
    # "on" leg never actually ran the kernel — the (10,)-padded frame
    # lod_distances tripped the NLD > 7 fallback every frame, so the r4/r5
    # early "roll A/Bs" timed two identical scan programs (their deltas were
    # tunnel noise).  frame.py now slices the padded table to the reachable
    # 7 entries (valid for lod_levels <= 7); default stays "off" pending a
    # real paired TPU A/B of the actually-engaged kernel.  That A/B landed
    # (ab_roll2_*, r5): -52 ms p50 on mill2048 (7-1 wins), -5 ms on
    # terrain2048 (6-2), 0 px diffs, no fallback — default is now "on"
    # (frame wiring still requires lod_levels <= 7 for the reachable-slice)
    kernel_roll: str = "on"
    # checkpoint sweep skip ("on" | "off"): deep-RLE sweeps start at the
    # deepest RB boundary every lane's frustum window provably hasn't
    # reached (far-side runs only move the integer-exact cursor — see
    # phase1_kernel).  "off" is the paired-A/B ablation leg
    kernel_sweep_skip: str = "on"
    # per-frame ray init on the host (numpy) or on device (jnp).  Both are
    # bit-exact vs the oracle: device init pins FMA contraction (opaque-one
    # multiplies), uses correctly-rounded soft divide/sqrt (utils/ieee.py —
    # TPU hardware divide/sqrt are ~1 ulp off IEEE), and fixes the matmul
    # accumulation order (camera.mat4_vec); perf/check_device_init.py is the
    # on-TPU proof.  False (default) removes ~19 ms/frame of host numpy from
    # the critical path (PERF_NOTES lever 4); True remains for debugging and
    # as the fallback if a future libtpu changes rounding again.
    host_init: bool = False
    # ray groups of 128 lanes per kernel block (VMEM budget vs divergence knob)
    block_groups: int = 4
    # run Pallas in interpreter mode (CPU tests)
    pallas_interpret: bool = False

    @property
    def screen(self) -> tuple[int, int]:
        return (self.width, self.height)

    @property
    def far_clip_multiplier(self) -> int:
        # UnityManager.cs:421: REPEAT_WORLD ? 10 : 2 — we fix REPEAT_WORLD=False
        return 2
