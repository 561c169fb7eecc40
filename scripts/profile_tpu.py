#!/usr/bin/env python
"""Phase-level TPU profile of the conference workload: times candidate
selection, the Pallas traversal kernel, a full closest-hit call, an
occlusion call, and the whole frame, each compiled and steady-state.

Run on the TPU host:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_tpu.py
"""
import time

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1e3:10.2f} ms")
    return dt


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import render_frame, _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)
    grid = scene.bvh
    print("supers:", grid.num_supers, "blocks:", grid.tb.shape[0],
          "top_s:", grid.top_s, "top_m:", grid.top_m)

    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    u, v, pids, inv = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.block_until_ready(o)
    b = o.shape[0]
    print("rays:", b)

    prev_kind = jnp.full((b,), -1, jnp.int32)
    prev_id = jnp.full((b,), -1, jnp.int32)

    cand_j = jax.jit(lambda o, d: pallas_bvh._candidates(grid, o, d))
    dt_cand = timeit("candidates (XLA phases A+B)", cand_j, o, d)

    cg, cf, ce = jax.block_until_ready(cand_j(o, d))
    m = cg.shape[1]
    t0v = jnp.full((b,), C.RAY_LENGTH_MAX, jnp.float32)
    rays8 = jnp.concatenate(
        [o, d, t0v[:, None], jnp.full((b, 1), -1.0, jnp.float32)], axis=1)

    trav = jax.jit(lambda cg, cf, ce, rays8: pallas_bvh._traverse_padded(
        grid.tb, cg, cf, ce, rays8, m, False, False))
    dt_kern = timeit("pallas kernel (closest walk)", trav, cg, cf, ce, rays8)

    closest_j = jax.jit(lambda o, d: pallas_bvh.intersect_scene_pallas(
        scene, o, d, prev_kind, prev_id))
    dt_closest = timeit("full closest-hit (planes+spheres+tri)",
                        closest_j, o, d)

    occl_j = jax.jit(lambda o, d: pallas_bvh.occluded_pallas(
        scene, o, d, jnp.full((b,), 10.0, jnp.float32), prev_kind, prev_id))
    dt_occl = timeit("occlusion (any-hit)", occl_j, o, d)

    key = jax.random.PRNGKey(0)
    dt_frame = timeit("full frame (Whitted 512x512 1spp)",
                      lambda: render_frame(scene, cam, cfg, key)["image"])

    print(f"\ncandidates+kernel = {1e3*(dt_cand+dt_kern):.2f} ms "
          f"(primary traversal)")
    print(f"frame = {dt_frame*1e3:.2f} ms")


if __name__ == "__main__":
    main()
