"""Round-5 third queue: confirm the STACKED new gated defaults against the
round-4 configuration in one paired A/B per scene (the individual wins —
walk16 -60, roll -52, cond-off -41, rb8 -28 on mill2048 — overlap heavily,
all attacking the same Mosaic control overhead; only the stack measurement
is honest).  A = round-5 defaults ({}), B = round-4 equivalents."""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

R4 = ('{"kernel_walk_tile": 8, "kernel_walk_cond": "on", '
      '"kernel_run_block": 4, "kernel_roll": "off"}')
AB = [py, "perf/ab_cfg.py"]
for scene in ("mill2048", "layered2048", "terrain2048", "mill1024"):
    step(f"ab_r5stack_{scene}",
         AB + [scene, "1920x1080", "8", "{}", R4], 2400)
log("queue_r5c done")
