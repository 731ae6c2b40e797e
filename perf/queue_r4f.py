"""Round-4 third-session queue: validate the two unmeasured hot-path
defaults (kernel_sweep_skip, solid_kill) with paired A/Bs, then the
mill2048 split.  Health-gated per step (finding 19 methodology)."""
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


# The two unmeasured defaults, on the scenes they target.
step("ab_sweep_skip_layered2048",
     [py, "perf/ab_cfg.py", "layered2048", "1920x1080", "8",
      '{"kernel_sweep_skip": "on"}', '{"kernel_sweep_skip": "off"}'], 3600)
step("ab_sweep_skip_mill1024",
     [py, "perf/ab_cfg.py", "mill1024", "1920x1080", "8",
      '{"kernel_sweep_skip": "on"}', '{"kernel_sweep_skip": "off"}'], 2400)
step("ab_solid_kill_mill2048",
     [py, "perf/ab_cfg.py", "mill2048", "1920x1080", "8",
      '{"solid_kill": "on"}', '{"solid_kill": "off"}'], 3600)
step("ab_solid_kill_terrain2048",
     [py, "perf/ab_cfg.py", "terrain2048", "1920x1080", "8",
      '{"solid_kill": "on"}', '{"solid_kill": "off"}'], 2400)
step("split_mill2048",
     [py, "perf/bench_phase1_split.py", "mill2048", "1920x1080", "on", "128"],
     3600)
log("queue done")
