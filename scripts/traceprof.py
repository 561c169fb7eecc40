#!/usr/bin/env python
"""Splits the Pallas traversal cost into candidate-selection (XLA) vs the
kernel walk, for primary closest-hit and NEE shadow batches, on the
conference proxy at 512x512."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)
    grid = scene.bvh
    print(f"supers={grid.num_supers} bps={grid.bps} "
          f"blocks={grid.tb.shape[0]} top_s={grid.top_s} top_m={grid.top_m}")

    cfg = RenderConfig(width=512, height=512, spp=1)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)
    big = jnp.full((b,), C.RAY_LENGTH_MAX, jnp.float32)

    # (a) candidate selection alone
    cand_fn = jax.jit(lambda o, d: pallas_bvh._candidates(grid, o, d))
    (cg, cf, ce), dt_cand = timeit("candidates (XLA)", cand_fn, o, d)

    # (b) kernel alone, candidates precomputed
    m = cg.shape[1]
    rays = jnp.concatenate(
        [o, d, big[:, None], jnp.full((b, 1), -1.0)], axis=1)
    kern_fn = jax.jit(lambda cg, cf, ce, rays: pallas_bvh._traverse_padded(
        grid.tb, cg, cf, ce, rays, m, False, pallas_bvh._interpret()))
    _, dt_kern = timeit("kernel walk (closest)", kern_fn, cg, cf, ce, rays)

    # (c) full closest
    full_fn = jax.jit(lambda o, d: pallas_bvh.traverse(
        grid, scene.triangles, o, d, big, pk, pi))
    _, dt_full = timeit("traverse closest (cand+kernel)", full_fn, o, d)

    # (d) full scene intersect (adds planes/spheres/lights/hit-fill)
    isect_fn = jax.jit(lambda o, d: pallas_bvh.intersect_scene_pallas(
        scene, o, d, pk, pi))
    _, dt_isect = timeit("intersect_scene_pallas", isect_fn, o, d)

    # (e) any-hit on the same rays (not representative dist, but scale)
    occl_fn = jax.jit(lambda o, d: pallas_bvh.occluded_pallas(
        scene, o, d, big * 0 + 100.0, pk, pi))
    _, dt_occl = timeit("occluded_pallas", occl_fn, o, d)

    print(f"\nrays={b}  closest Mrays/s={b/dt_full/1e6:.2f}  "
          f"cand share={dt_cand/dt_full*100:.0f}%")


if __name__ == "__main__":
    main()
