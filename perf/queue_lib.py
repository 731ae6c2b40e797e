"""Shared health-gated step runner for the perf queues (ADVICE r4: the
PROBE/probe_once/wait_healthy/step block was duplicated verbatim across
queue_r4f/queue_r4g; a health-gate fix in one file silently missed the
other).  Usage:

    from queue_lib import make_runner
    step, log = make_runner(out_dir)
    step("ab_foo", [py, "perf/ab_cfg.py", ...], timeout=2400)

Each step waits for a healthy tunnel (warm round-trip < 10 s, probed in a
subprocess because a hung PJRT init cannot be cancelled in-process), then
runs the command with stdout+stderr teed to <out>/<name>.log.
"""
import os
import subprocess
import sys
import time

PROBE = ("import time,jax,jax.numpy as jnp,numpy as np;"
         "x=jnp.ones((256,256));v=np.asarray((x@x).sum());"
         "t0=time.time();x=x+1.0;v=np.asarray((x@x).sum());"
         "print('RT %.2f' % (time.time()-t0))")


def make_runner(out_dir="perf/queue_out", rt_bar_s=10.0):
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()
    py = sys.executable

    def log(*a):
        print(f"[queue +{time.time() - t_start:7.0f}s]", *a, flush=True)

    def probe_once(timeout=240):
        try:
            r = subprocess.run([py, "-c", PROBE], timeout=timeout,
                               capture_output=True, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("RT "):
                    rt = float(line.split()[1])
                    log(f"probe warm round-trip {rt:.2f}s")
                    return rt < rt_bar_s
        except subprocess.TimeoutExpired:
            log("probe timed out")
        return False

    def wait_healthy():
        while not probe_once():
            log("tunnel unhealthy; sleeping 120s")
            time.sleep(120)

    def step(name, argv, timeout, env_extra=None):
        wait_healthy()
        path = os.path.join(out_dir, name + ".log")
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
        return rc

    return step, log
