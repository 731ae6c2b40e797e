"""Round-5 first queue: TPU-validate the pending kernel knobs on the scenes
where their target cost is largest (split_mill2048: walk ~120 ms,
roll+fixed ~40 ms), and REMEASURE argb_records on terrain2048 — the round-2
"net-lose" verdict predates the wide-row discount (gather_width_r5.log:
a 96B row costs ~2.2x a 32B row, not 3x, while ARGB kills the flat ~54 ms
resolve gather).  Health-gated per step (finding 19 methodology)."""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

AB = [py, "perf/ab_cfg.py"]
step("ab_walk16_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_walk_tile": 16}', '{"kernel_walk_tile": 8}'], 2400)
step("ab_roll_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_roll": "on"}', '{"kernel_roll": "off"}'], 2400)
step("ab_walk16_layered2048",
     AB + ["layered2048", "1920x1080", "8",
           '{"kernel_walk_tile": 16}', '{"kernel_walk_tile": 8}'], 2400)
step("ab_argb_terrain2048",
     AB + ["terrain2048", "1920x1080", "8",
           '{"argb_records": true}', '{"argb_records": false}'], 2400)
step("ab_roll_terrain2048",
     AB + ["terrain2048", "1920x1080", "8",
           '{"kernel_roll": "on"}', '{"kernel_roll": "off"}'], 2400)
step("ab_slot_gate_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"kernel_slot_gate": "on"}', '{"kernel_slot_gate": "off"}'], 2400)
step("ab_chunk256_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"chunk_steps": 256}', '{}'], 2400)
log("queue_r5a done")
