"""Round-4 third-session queue C: slot-gate A/Bs + conversion profile.
Runs after queue_r4f; same health-gated step runner."""
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


step("ab_slot_gate_mill1024",
     [py, "perf/ab_cfg.py", "mill1024", "1920x1080", "8",
      '{"kernel_slot_gate": "on"}', '{"kernel_slot_gate": "off"}'], 2400)
step("ab_slot_gate_layered2048",
     [py, "perf/ab_cfg.py", "layered2048", "1920x1080", "8",
      '{"kernel_slot_gate": "on"}', '{"kernel_slot_gate": "off"}'], 3600)
step("profile_convert2048",
     [py, "perf/profile_convert.py", "2048", "2"], 3000,
     {"JAX_ENABLE_X64": "1"})
log("queue done")
