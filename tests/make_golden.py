"""Regenerate the committed golden fixtures (tests/golden/*.npz) from the oracle.

Run from repo root:  python tests/make_golden.py
Only rerun when a deliberate, verified semantic change shifts pixels; goldens pin
today's verified output against silent regressions (VERDICT r1 item 7).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import scenes

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# (name, scene builder key, campos, pitch, yaw, roll) — mirrors
# test_pallas_kernel CASES, plus a rolled camera (the bench path rolls the
# camera 180->360 degrees over its final eighth; VERDICT r2 weak #3)
CASES = [
    ("floor_down", "floor", (8, 6, 8), 85.0, 0.0, 0.0),
    ("floor_gentle", "floor", (8, 3, 8), 8.0, 45.0, 0.0),
    ("floor_up", "floor", (8, 6, 8), -35.0, 10.0, 0.0),
    ("tower", "tower", (8.5, 5, 2), 5.0, 0.0, 0.0),
    ("random", "random", (8, 10, 8), 25.0, 70.0, 0.0),
    ("floor_plunge", "floor", (8, 12, 8), 89.0, 30.0, 0.0),
    ("outside_world", "random", (-6, 9, -6), 30.0, 45.0, 0.0),
    ("roll180", "random", (8, 10, 8), 25.0, 70.0, 180.0),
]


def build(scene):
    if scene == "floor":
        return scenes.flat_floor_world()
    if scene == "tower":
        return scenes.tower_world(x=8, z=12, height=10)
    return scenes.random_world(n=300, seed=5)


def main():
    from cpuvox_tpu.render import camera as cm

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, scene, pos, pitch, yaw, roll in CASES:
        w = build(scene)
        cam = cm.Camera(position=pos, pitch_deg=pitch, yaw_deg=yaw,
                        roll_deg=roll, screen=(64, 48))
        screen, (td, lr, *_rest) = scenes.render_oracle_frame(w, cam)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, screen=screen, td=td, lr=lr)
        print(f"{name}: screen{screen.shape} td{td.shape} lr{lr.shape} -> {path}")


if __name__ == "__main__":
    main()
