#!/usr/bin/env python
"""Benchmark: rays/s on the canonical conference workload, printed as one
JSON line.

Metric definition matches the reference: total casted rays (camera +
secondary + shadow) divided by render wall time (reference
app/System_dependent/Native/C_wrapper.cpp:256 "Total Millions rays per
second"; numerator from the global Ray-id counter, Ray.cpp:26-28).

Workload: the reference's conference OBJ is not vendored (only .cam/.mtl),
so we render the procedural conference proxy at the reference's exact
scale — 331,179 triangles, 2 area lights, the real conference.mtl
materials and conference.cam camera — Whitted, BVH, 512x512, 1 SPP
(BASELINE.md config #3).  vs_baseline is reported against the north-star
1e9 rays/s/host target since the reference publishes no absolute numbers.
"""
import json
import time

import jax


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import Renderer, render_frame
    from mobileraytracer_tpu.types import RenderConfig

    scene, cam, info = conference_proxy()
    if jax.default_backend() in ("tpu", "axon"):
        from mobileraytracer_tpu.ops import pallas_bvh
        scene = pallas_bvh.build(scene)
    else:
        from mobileraytracer_tpu.ops import block_bvh
        scene = block_bvh.build(scene)
    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    key = jax.random.PRNGKey(0)

    # Warmup / compile.  The scalar fetch is deliberate: on tunneled TPU
    # backends the first device-to-host transfer pays a large one-time
    # handshake cost that must not land in the timed region.
    out = render_frame(scene, cam, cfg, key)
    out["image"].block_until_ready()
    _ = int(out["rays"])

    reps = 5
    t0 = time.perf_counter()
    rays = 0
    for _ in range(reps):
        out = render_frame(scene, cam, cfg, key)
        out["image"].block_until_ready()
        rays += int(out["rays"])
    dt = time.perf_counter() - t0

    rays_per_s = rays / dt
    target = 1.0e9  # north-star rays/s per host (BASELINE.md)
    print(json.dumps({
        "metric": "rays_per_second",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
    }))


if __name__ == "__main__":
    main()
