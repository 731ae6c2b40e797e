"""Round-4 final measurement queue (second session, defaults settled:
lite off, block_fetch off, drain one-group, FLAT resolve, guaranteed gated
march budget): scene benches for the round record, interactive latency,
conversion steady-state, and the two remaining knob A/Bs.  Health-gated per
step (ADVICE r3).  ONE TPU job at a time."""
import os
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "perf/queue_out"
os.makedirs(OUT, exist_ok=True)
PROBE = ("import time,jax,jax.numpy as jnp,numpy as np;"
         "x=jnp.ones((256,256));v=np.asarray((x@x).sum());"
         "t0=time.time();x=x+1.0;v=np.asarray((x@x).sum());"
         "print('RT %.2f' % (time.time()-t0))")
T0 = time.time()
py = sys.executable


def log(*a):
    print(f"[queue +{time.time() - T0:7.0f}s]", *a, flush=True)


def probe_once(timeout=240):
    try:
        r = subprocess.run([py, "-c", PROBE], timeout=timeout,
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("RT "):
                rt = float(line.split()[1])
                log(f"probe warm round-trip {rt:.2f}s")
                return rt < 10.0
    except subprocess.TimeoutExpired:
        log("probe timed out")
    return False


def wait_healthy():
    while not probe_once():
        log("tunnel unhealthy; sleeping 120s")
        time.sleep(120)


def step(name, argv, timeout, env_extra=None):
    wait_healthy()
    path = os.path.join(OUT, name + ".log")
    log(f"step {name} (timeout {timeout}s)")
    t0 = time.time()
    env = dict(os.environ, **(env_extra or {}))
    with open(path, "w") as f:
        try:
            rc = subprocess.run(argv, stdout=f, stderr=subprocess.STDOUT,
                                timeout=timeout, env=env).returncode
        except subprocess.TimeoutExpired:
            rc = "TIMEOUT"
    log(f"step {name}: rc={rc} in {time.time() - t0:.0f}s -> {path}")


step("bench_mill1024_r4", [py, "bench.py"], 2400,
     {"BENCH_SCENE": "mill1024"})
step("bench_mill2048_r4", [py, "bench.py"], 3600,
     {"BENCH_SCENE": "mill2048"})
step("bench_terrain2048_r4", [py, "bench.py"], 3000,
     {"BENCH_SCENE": "terrain2048"})
step("bench_layered2048_r4", [py, "bench.py"], 4800,
     {"BENCH_SCENE": "layered2048"})
step("interactive_mill1024_r4", [py, "bench.py"], 2400,
     {"BENCH_SCENE": "interactive_mill1024"})
step("convert2048_steady_r4",
     [py, "-m", "cpuvox_tpu.assets.convert_cli",
      "/root/reference/datasets/mill.obj", "/tmp/mill2048_steady.world",
      "--max-dim", "2048", "--verbose", "--repeat"], 3000,
     {"JAX_ENABLE_X64": "1"})
step("ab_chunk_terrain2048",
     [py, "perf/ab_cfg.py", "terrain2048", "1920x1080", "8",
      '{"chunk_steps": 64}', '{"chunk_steps": 32}'], 1800)
step("ab_run_block_mill1024",
     [py, "perf/ab_cfg.py", "mill1024", "1920x1080", "8",
      '{"kernel_run_block": 8}', '{"kernel_run_block": 4}'], 1800)
log("queue done")
