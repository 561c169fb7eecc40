#!/usr/bin/env python
"""Benchmark: vertex-gradient throughput (Mpixel-grads/s), printed as one
JSON line.

Workload: cornell2 (analytic scene: 4 triangles incl. 2 area lights,
spheres, walls), Whitted, 256x256 — full d(mean image)/d(vertices) with
interior AD + edge-sampled visibility terms (mobileraytracer_tpu.diff).
Metric: pixels whose gradient contribution was computed per second.
Timing follows PERF.md "Measuring on axon": server-side repetition via
fori_loop, varying keys, one scalar fetch.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu import scenes
    from mobileraytracer_tpu.diff import vertex_grad
    from mobileraytracer_tpu.types import RenderConfig

    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = jax.device_put(scene)
    size = 256
    cfg = RenderConfig(width=size, height=size, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE,
                       scene_id=C.SCENE_CORNELL2)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(n):
        def body(i, carry):
            loss, grads = vertex_grad(scene, cam, cfg,
                                      jax.random.fold_in(key, i),
                                      edge_samples=8)
            s = sum(jnp.sum(g) for g in grads.values())
            return carry * 1e-20 + loss + s
        return jax.lax.fori_loop(0, n, body, jnp.zeros(()))

    float(run(1))
    t0 = time.perf_counter()
    float(run(1))
    t1 = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    float(run(reps))
    tn = time.perf_counter() - t0
    dt = max((tn - t1) / (reps - 1), 1e-9)

    mpx = size * size / dt / 1e6
    print(json.dumps({
        "metric": "mpixel_grads_per_second",
        "value": mpx,
        "unit": "Mpixel-grads/s",
        "vs_baseline": mpx,  # no reference counterpart (forward-only C++)
    }))


if __name__ == "__main__":
    main()
