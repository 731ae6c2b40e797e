"""Round-5 second queue (run after queue_r5a): escalate the walk-tile win
(WT=16 measured -60 ms p50 on mill2048, 6-2 wins, bit-exact — the walk
while-loop is Mosaic-control-bound, so taller tiles keep paying), plus the
dense-path leg and any knob-combination follow-ups."""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

AB = [py, "perf/ab_cfg.py"]
step("ab_walk32_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_walk_tile": 32}', '{"kernel_walk_tile": 16}'], 2400)
step("ab_walk16_terrain2048",
     AB + ["terrain2048", "1920x1080", "8",
           '{"kernel_walk_tile": 16}', '{"kernel_walk_tile": 8}'], 2400)
step("ab_walk32_layered2048",
     AB + ["layered2048", "1920x1080", "8",
           '{"kernel_walk_tile": 32}', '{"kernel_walk_tile": 16}'], 2400)
# walk_cond removal rides on the winning walk tile (A/B against the same tile)
step("ab_walkcond_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_walk_tile": 16, "kernel_walk_cond": "off"}',
           '{"kernel_walk_tile": 16}'], 2400)
# run-block 8 halves rb_body iterations => half as many merged walks; was a
# wash at WT=8 (ab_run_block_mill1024 -3 ms) but the control-overhead finding
# shifts the balance — each walk's fixed cost is what WT=16 just proved big
step("ab_rb8_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_walk_tile": 16, "kernel_run_block": 8}',
           '{"kernel_walk_tile": 16}'], 2400)
# the REAL roll A/B: the r5a legs both ran the scan (NLD>7 fallback, now
# fixed by the frame-level lod_distances slice) — this is the kernel's first
# actual engagement on TPU, so the spot-frame equality check matters as much
# as the timing
step("ab_roll2_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_roll": "on"}', '{"kernel_roll": "off"}'], 2400)
step("ab_roll2_terrain2048",
     AB + ["terrain2048", "1920x1080", "8",
           '{"kernel_roll": "on"}', '{"kernel_roll": "off"}'], 2400)
# slot_gate won -64 ms on mill2048 at walk tile 8 (r5a ran before the WT-16
# default flip); re-check the interaction at the new default tile height
step("ab_slotgate16_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_slot_gate": "on"}', '{"kernel_slot_gate": "off"}'], 2400)
log("queue_r5b done")
