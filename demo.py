"""Headless demo app — the frame-driver equivalent of the reference's UnityManager
(load/convert worlds, render modes, resolution scaling, flythrough; UnityManager.cs).

Usage:
  python demo.py --scene mill --frames 8 --out /tmp/frames          # orbit the mill
  python demo.py --world path/to/file.world --mode raybuffer-topdown
  python demo.py --obj model.obj --max-dim 256 --save model.world   # "Convert" button
  python demo.py --scene terrain --flythrough --frames 24           # benchmark path

Render modes mirror the reference's keys 1/2/3 (screen buffer / raw raybuffer views,
UnityManager.cs:126-146); frames are written as PPM (plus PNG when PIL is present).
"""
import argparse
import os
import sys
import time


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", choices=["mill", "terrain"], default="mill")
    ap.add_argument("--obj", help=".obj to convert (overrides --scene)")
    ap.add_argument("--world", help=".world file to load (overrides --scene)")
    ap.add_argument("--save", help="save converted world to this .world path")
    ap.add_argument("--max-dim", type=int, default=256)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--res-scale", type=float, default=1.0,
                    help="resolution multiplier (keys 4/5 in the reference)")
    ap.add_argument("--mode", default="screen",
                    choices=["screen", "raybuffer-topdown", "raybuffer-leftright"])
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--interactive", action="store_true",
                    help="live terminal loop (WASD + arrows; reference key 1-3 "
                         "render modes; UnityManager.Update equivalent)")
    ap.add_argument("--flythrough", action="store_true",
                    help="use the benchmark path instead of an orbit")
    ap.add_argument("--backend", default=None, choices=[None, "pallas", "xla"])
    ap.add_argument("--cpu", action="store_true",
                    help="pin the JAX CPU backend (this environment's TPU "
                    "plugin overrides JAX_PLATFORMS, so an env var is not "
                    "enough); combine with "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=N for "
                    "a virtual mesh")
    ap.add_argument("--world-shard", action="store_true",
                    help="stripe LOD0 over all local devices and render "
                    "through the camera-local window exchange "
                    "(parallel/world_shard.py)")
    ap.add_argument("--tile-cols", type=int, default=256,
                    help="world-shard tile side in columns (power of two)")
    ap.add_argument("--lod-error", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/cpuvox_frames")
    ap.add_argument("--profile", action="store_true")
    return ap.parse_args()


def build_world(args):
    if args.world:
        from cpuvox_tpu.world.save import load_world

        return load_world(args.world)
    if args.obj:
        from cpuvox_tpu.assets.pipeline import convert_obj_to_world

        return convert_obj_to_world(args.obj, max_dimension=args.max_dim,
                                    save_path=args.save, verbose=True)
    if args.scene == "mill":
        from cpuvox_tpu.assets.pipeline import convert_obj_to_world

        return convert_obj_to_world("/root/reference/datasets/mill.obj",
                                    max_dimension=args.max_dim, verbose=True)
    from cpuvox_tpu.models.procedural import heightmap_world

    return heightmap_world(dims=(512, 128, 512), seed=7, shell_depth=6)


def main():
    args = parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cpuvox_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from cpuvox_tpu.bench.path import BENCH_CLIP_LENGTH, benchmark_camera
    from cpuvox_tpu.config import RenderConfig
    from cpuvox_tpu.render import camera as cm
    from cpuvox_tpu.render.frame import Renderer
    from cpuvox_tpu.utils.colors import to_rgb_image, write_ppm
    from cpuvox_tpu.utils.profiling import PROFILER

    lods = build_world(args)
    dims = lods[0].dims
    w, h = args.width, args.height
    # reference keys 4/5: render low-res through the fake camera, display native
    cfg = RenderConfig(width=w, height=h, render_scale=args.res_scale,
                       lod_error=args.lod_error,
                       **({"backend": args.backend} if args.backend else {}))
    with PROFILER.scope("create-renderer"):
        if args.world_shard:
            import jax
            from jax.sharding import Mesh

            from cpuvox_tpu.parallel.world_shard import ShardedRenderer

            mesh = Mesh(np.array(jax.devices()), axis_names=("world",))
            renderer = ShardedRenderer(lods, mesh, cfg,
                                       tile_cols=args.tile_cols)
        else:
            renderer = Renderer.create(lods, cfg)

    if args.interactive:
        from cpuvox_tpu.frontend.interactive import (InteractiveSession,
                                                     run_terminal)

        session = InteractiveSession.create(lods, cfg, renderer=renderer)
        run_terminal(session)
        return

    def camera_at(i):
        if args.flythrough:
            t = BENCH_CLIP_LENGTH * i / max(args.frames - 1, 1)
            return benchmark_camera(t, dims, (w, h))
        ang = 360.0 * i / args.frames
        rad = 0.9 * max(dims[0], dims[2])
        pos = (dims[0] / 2 + rad * np.sin(np.deg2rad(ang)), dims[1] * 0.8,
               dims[2] / 2 - rad * np.cos(np.deg2rad(ang)))
        return cm.Camera(position=pos, pitch_deg=25.0, yaw_deg=ang,
                         screen=(w, h))

    for i in range(args.frames):
        cam = camera_at(i)
        t0 = time.perf_counter()
        with PROFILER.scope("render"):
            if args.mode == "screen":
                img = renderer.render(cam)
            else:
                _, (td, lr, *_r) = renderer.render(cam, return_raybuffers=True)
                img = td if args.mode == "raybuffer-topdown" else lr
        dt = time.perf_counter() - t0
        path = os.path.join(args.out, f"frame_{i:03d}.ppm")
        with PROFILER.scope("write"):
            write_ppm(path, to_rgb_image(np.asarray(img)[::-1]))
            try:
                from PIL import Image

                Image.open(path).save(path.replace(".ppm", ".png"))
            except Exception:
                pass
        print(f"frame {i}: {dt * 1e3:.1f} ms -> {path}", file=sys.stderr)

    if args.profile:
        print(PROFILER.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
