#!/usr/bin/env python
"""Benchmark: rays/s on the canonical workload, printed as one JSON line.

Metric definition matches the reference: total casted rays (camera +
secondary + shadow) divided by render wall time (reference
app/System_dependent/Native/C_wrapper.cpp:256 "Total Millions rays per
second"; numerator from the global Ray-id counter, Ray.cpp:26-28).

Workload: the conference OBJ is not vendored by the reference (only
.cam/.mtl are); until an OBJ is present we benchmark the heaviest
reference-buildable config: cornellBox2 (area lights, mirror + transmissive
spheres), Whitted, 512x512, 1 SPP.  vs_baseline is reported against the
north-star 1e9 rays/s/host target (BASELINE.md) since the reference
publishes no absolute numbers.
"""
import json
import time

import jax
import numpy as np


def main():
    from mobileraytracer_tpu import scenes
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.renderer import render_frame
    from mobileraytracer_tpu.types import RenderConfig

    size = 512
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    cfg = RenderConfig(width=size, height=size, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE)
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
