"""Round-5 fifth queue: correctness of the round record.
- re-split mill2048/terrain2048 with the FIXED split script (the old one
  fell through to phase1_pallas parameter defaults: walk8/cond-on/rb4/scan
  roll/chunk32 AND block_fetch=True — a configuration no frame runs)
- steady-state conversion with JAX_ENABLE_X64 in the ENV (sitecustomize
  imports jax before the script's setdefault could run)
- dynamic512 roll on/off pair (diagnose the 0.42 fps record)
- dynamic512 bench rerun
"""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

step("split_mill2048_r5v2", [py, "perf/bench_phase1_split.py", "mill2048"],
     3600)
step("ab_dynamic_roll", [py, "perf/ab_dynamic_roll.py"], 2400)
step("bench_dynamic512_r5v2", [py, "bench.py"], 1800,
     env_extra={"BENCH_WAIT_DEVICE": "0", "BENCH_SCENE": "dynamic512"})
step("split_terrain2048_r5v2",
     [py, "perf/bench_phase1_split.py", "terrain2048"], 3600)
step("convert2048_steady_r5", [py, "perf/profile_convert.py", "2048"], 3600,
     env_extra={"JAX_ENABLE_X64": "1"})
log("queue_r5e done")
