from .path import benchmark_camera, BENCH_CLIP_LENGTH
from .harness import run_flythrough
