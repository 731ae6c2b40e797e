"""Round-5 fourth queue: GK (gated_group_cells) sweep on mill2048 under the
new defaults.  The fetch pays GK x Rk gather slots per chunk iteration while
rays with more than GK gated cells rewind and re-pay the chunk roll; the
roll kernel (now default) made re-rolls cheaper, which may shift finding
19's GK=16 balance in either direction."""
import sys

sys.path.insert(0, "perf")
from queue_lib import make_runner

step, log = make_runner()
py = sys.executable

AB = [py, "perf/ab_cfg.py"]
step("ab_gk8_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"gated_group_cells": 8}', '{}'], 2400)
step("ab_gk32_mill2048",
     AB + ["mill2048", "1920x1080", "8",
           '{"gated_group_cells": 32}', '{}'], 2400)
log("queue_r5d done")
