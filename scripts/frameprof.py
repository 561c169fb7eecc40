#!/usr/bin/env python
"""Frame cost vs walker iteration cap / shader on the conference proxy."""
import dataclasses
import time
import jax
import jax.numpy as jnp


def t_frame(label, scene, cam, cfg, reps=3):
    from mobileraytracer_tpu.renderer import render_frame
    key = jax.random.PRNGKey(0)
    out = render_frame(scene, cam, cfg, key)
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = render_frame(scene, cam, cfg, key)
        jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:9.1f} ms  rays={int(out['rays'])}")
    return dt


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)

    base = RenderConfig(width=512, height=512, spp=1,
                        shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)

    t_frame("DepthMap (1 closest)", scene, cam,
            dataclasses.replace(base, shader=C.SHADER_DEPTHMAP))
    t_frame("Diffuse (1 closest)", scene, cam,
            dataclasses.replace(base, shader=C.SHADER_DIFFUSE))
    t_frame("NoShadows (1 iter, no occl)", scene, cam,
            dataclasses.replace(base, shader=C.SHADER_NOSHADOWS))
    for iters in (1, 2, 4, 8, 14):
        t_frame(f"Whitted max_walk_iters={iters}", scene, cam,
                dataclasses.replace(base, max_walk_iters=iters))


if __name__ == "__main__":
    main()

def lanes_experiment():
    import dataclasses
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh

    base = RenderConfig(width=512, height=512, spp=1,
                        shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    for lanes in (128, 256, 512):
        scene, cam, info = conference_proxy()
        scene = pallas_bvh.build(scene, lanes=lanes)
        t_frame(f"Whitted lanes={lanes}", scene, cam, base)
