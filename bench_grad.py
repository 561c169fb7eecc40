#!/usr/bin/env python
"""Benchmark: vertex-gradient throughput (Mpixel-grads/s), printed as one
JSON line.

Default workload (BASELINE.md config #5 scale, single chip): the
conference proxy (331k triangles), Whitted, block/Pallas BVH, 512x512 —
full d(mean image)/d(vertices) with interior AD through the
differentiable BVH tracer path, silhouette-culled length-importance-
sampled edge boundaries (edge_budget), and the NEE shadow-edge boundary
term.  `--small` runs the round-3 cornell2/naive/256 configuration for
comparison.  Metric: pixels whose gradient contribution was computed per
second.  Timing follows PERF.md "Measuring on axon": server-side
repetition via fori_loop, varying keys, one scalar fetch.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="round-3 config: cornell2 analytic, naive, 256^2")
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--edge-budget", type=int, default=4096)
    ap.add_argument("--shadow-budget", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=None,
                    help="interior-AD pixel chunk (defaults to 256k lanes "
                         "for frames above 512^2 — the watchdog/memory "
                         "guard for 1080p-scale gradients)")
    args = ap.parse_args()

    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu import scenes
    from mobileraytracer_tpu.diff import vertex_grad
    from mobileraytracer_tpu.diff.geom import edge_topology
    from mobileraytracer_tpu.types import RenderConfig

    if args.small:
        scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
        scene = jax.device_put(scene)
        size = args.size or 256
        cfg = RenderConfig(width=size, height=size, spp=1,
                           shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE,
                           scene_id=C.SCENE_CORNELL2)
        kwargs = {}
    else:
        from mobileraytracer_tpu.bench_scenes import conference_proxy
        scene, cam, info = conference_proxy()
        keep = edge_topology(scene.triangles)
        if jax.default_backend() in ("tpu", "axon"):
            from mobileraytracer_tpu.ops import pallas_bvh
            scene = pallas_bvh.build(scene)
        else:
            from mobileraytracer_tpu.ops import block_bvh
            scene = block_bvh.build(scene)
        size = args.size or 512
        cfg = RenderConfig(width=size, height=size, spp=1,
                           shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH,
                           nee_share=128)
        kwargs = dict(edge_keep=jnp.asarray(keep),
                      edge_budget=args.edge_budget,
                      shadow_edges=True, shadow_budget=args.shadow_budget)
        print(f"# edges kept: {int(keep.sum())} / {keep.size}", flush=True)
    chunk = args.chunk
    if chunk is None and size * size > 512 * 512:
        chunk = 256 * 1024
    if chunk:
        kwargs["pixel_chunk"] = chunk
    key = jax.random.PRNGKey(0)

    if "pixel_chunk" in kwargs:
        # Chunked mode (1080p-scale): one fused executable would exceed
        # the backend watchdog (measured: a 1080p single-dispatch gradient
        # crashes the TPU worker), so vertex_grad runs phase-wise — its
        # interior chunks and jitted boundary phase each dispatch
        # separately and pipeline through the relay; timing fetches once
        # per repetition set.
        def run(n):
            s = jnp.zeros(())
            for i in range(int(n)):
                loss, grads = vertex_grad(scene, cam, cfg,
                                          jax.random.fold_in(key, i),
                                          edge_samples=8, **kwargs)
                s = s * 1e-20 + loss + sum(jnp.sum(g)
                                           for g in grads.values())
            return s
    else:
        @jax.jit
        def run(n):
            def body(i, carry):
                loss, grads = vertex_grad(scene, cam, cfg,
                                          jax.random.fold_in(key, i),
                                          edge_samples=8, **kwargs)
                s = sum(jnp.sum(g) for g in grads.values())
                return carry * 1e-20 + loss + s
            return jax.lax.fori_loop(0, n, body, jnp.zeros(()))

    float(run(1))
    t0 = time.perf_counter()
    float(run(1))
    t1 = time.perf_counter() - t0
    reps = 4
    t0 = time.perf_counter()
    float(run(reps + 1))
    tn = time.perf_counter() - t0
    dt = max((tn - t1) / reps, 1e-9)

    mpx = size * size / dt / 1e6
    print(json.dumps({
        "metric": "mpixel_grads_per_second",
        "value": mpx,
        "unit": "Mpixel-grads/s",
        "vs_baseline": mpx,  # no reference counterpart (forward-only C++)
    }))


if __name__ == "__main__":
    main()
