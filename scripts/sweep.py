#!/usr/bin/env python
"""Benchmark sweep harness — the analogue of the reference's
scripts/profile.sh (sweeps REPETITIONS x SHADERS x SCENES x ACCELERATORS
at a fixed resolution, awk-parses stdout into .dat files and plots
latency/speedup; profile.sh:181-205, 354-385).

Produces a whitespace-delimited .dat with one row per config:

    # scene shader accelerator spp spl width height rep render_s mrays_s
    0 1 3 1 1 512 512 1 0.53 1.04

Usage:
    python scripts/sweep.py --scenes 0 2 --shaders 1 2 --accs 1 3 \
        --size 256 --reps 3 --out sweep.dat [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, nargs="+", default=[0, 2])
    ap.add_argument("--shaders", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--accs", type=int, nargs="+", default=[1, 3])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--spl", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="sweep.dat")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from mobileraytracer_tpu import scenes as builtin
    from mobileraytracer_tpu.renderer import Renderer
    from mobileraytracer_tpu.types import RenderConfig

    rows = []
    for scene_id in args.scenes:
        scene, cam = builtin.load_builtin(scene_id, 1.0)
        for shader in args.shaders:
            for acc in args.accs:
                cfg = RenderConfig(width=args.size, height=args.size,
                                   spp=args.spp, samples_light=args.spl,
                                   shader=shader, accelerator=acc,
                                   scene_id=scene_id)
                r = Renderer(scene, cam, cfg,
                             max_point=builtin.DEPTHMAP_MAX_POINT[scene_id])
                # Warmup/compile outside the timed reps.
                r.render()
                times = []
                rays = 0
                for rep in range(args.reps):
                    r.reset()
                    r.render()
                    times.append(r.render_seconds)
                    rays = r.total_rays
                med = sorted(times)[len(times) // 2]
                mrays = rays / med / 1e6
                rows.append((scene_id, shader, acc, args.spp, args.spl,
                             cfg.width, cfg.height, args.reps, med, mrays))
                print(f"scene={scene_id} shader={shader} acc={acc}: "
                      f"median {med:.3f}s, {mrays:.3f} Mrays/s", flush=True)

    with open(args.out, "w") as f:
        f.write("# scene shader accelerator spp spl width height rep "
                "render_s mrays_s\n")
        for row in rows:
            f.write(" ".join(str(x) for x in row[:8])
                    + f" {row[8]:.4f} {row[9]:.4f}\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
