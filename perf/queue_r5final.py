"""Round-5 final-records queue: run AFTER the r5 A/Bs settle the defaults.
Produces the BENCH_EXTRA_r05 scene records (every scene through bench.py's
verify gate), the interactive latency records, steady-state conversion, and
a final mill2048 split for the 60-fps budget table.  Also warms the
persistent jax cache + world caches so the driver's end-of-round bench.py
run is fast (round 4's official record was lost to an rc=124 timeout on a
cold cache)."""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

env = {"BENCH_WAIT_DEVICE": "0"}  # the queue already health-gates per step
for scene in ("terrain2048", "mill2048", "layered2048", "mill1024"):
    step(f"bench_{scene}_r5", [py, "bench.py"], 2400,
         env_extra=dict(env, BENCH_SCENE=scene))
step("bench_rollout64_r5", [py, "bench.py"], 1800,
     env_extra=dict(env, BENCH_SCENE="rollout64"))
step("bench_dynamic512_r5", [py, "bench.py"], 1800,
     env_extra=dict(env, BENCH_SCENE="dynamic512"))
step("interactive_mill1024_r5", [py, "bench.py"], 2400,
     env_extra=dict(env, BENCH_SCENE="interactive_mill1024"))
step("convert2048_steady_r5", [py, "perf/profile_convert.py", "2048"], 3600)
step("split_mill2048_r5", [py, "perf/bench_phase1_split.py", "mill2048"], 3600)
step("split_terrain2048_r5", [py, "perf/bench_phase1_split.py", "terrain2048"],
     3600)
log("queue_r5final done")
