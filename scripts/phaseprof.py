#!/usr/bin/env python
"""Phase split of the conference-proxy Whitted frame on TPU: candidate
selection (XLA) vs Pallas traversal vs shading/walker overhead."""
import time

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def cached_conference(lanes=128):
    """Conference proxy with the Pallas block build cached on disk (the
    SAH+packing build is ~1 min of host work; it is identical across
    candidate-granularity sweeps)."""
    import os
    import pickle

    import numpy as np

    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.ops import pallas_bvh

    scene, cam, info = conference_proxy()
    path = f"/root/repo/.cache/conf_lanes{lanes}.pkl"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        tris2 = jax.tree.map(jnp.asarray, blob["tris"])
        grid = pallas_bvh.PallasGrid(
            **{k: jnp.asarray(v) for k, v in blob["grid"].items()},
            top_s=blob["top_s"], top_m=blob["top_m"])
        scene = scene.replace(triangles=tris2, bvh=grid)
    else:
        scene = pallas_bvh.build(scene, lanes=lanes)
        g = scene.bvh
        blob = {
            "tris": jax.tree.map(np.asarray, scene.triangles),
            "grid": {k: np.asarray(getattr(g, k)) for k in
                     ("super_lo", "super_hi", "blocks_packed", "tb",
                      "tri_attr")},
            "top_s": g.top_s, "top_m": g.top_m,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
    return scene, cam, info


def main():
    import os

    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh
    from mobileraytracer_tpu.renderer import _pixel_order, render_frame
    from mobileraytracer_tpu.types import RenderConfig

    t0 = time.perf_counter()
    lanes = int(os.environ.get("PP_LANES", "128"))
    scene, cam, info = cached_conference(lanes)
    grid = scene.bvh
    if "PP_TOPS" in os.environ:
        grid = grid.replace(top_s=int(os.environ["PP_TOPS"]))
    if "PP_TOPM" in os.environ:
        grid = grid.replace(top_m=int(os.environ["PP_TOPM"]))
    scene = scene.replace(bvh=grid)
    print(f"build: {time.perf_counter()-t0:.1f}s  ST={pallas_bvh.ST} "
          f"supers={grid.num_supers} blocks={grid.tb.shape[0]} "
          f"top_s={grid.top_s} top_m={grid.top_m}", flush=True)

    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.block_until_ready(o)
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)

    cand = jax.jit(lambda o, d: pallas_bvh._candidates(grid, o, d))
    cg, cf, ce = timeit("candidates only (primary)", cand, o, d)

    closest = jax.jit(lambda o, d: pallas_bvh.traverse(
        grid, scene.triangles, o, d, C.RAY_LENGTH_MAX, pk, pi))
    timeit("traverse closest (cand + kernel)", closest, o, d)

    steps = jax.jit(lambda o, d: pallas_bvh.traverse(
        grid, scene.triangles, o, d, C.RAY_LENGTH_MAX, pk, pi,
        with_steps=True)[2])
    sv = jax.block_until_ready(steps(o, d))
    print(f"visited blocks/subtile: mean={float(jnp.mean(sv)):.1f} "
          f"max={float(jnp.max(sv)):.0f} (budget top_m={grid.top_m})",
          flush=True)

    anyh = jax.jit(lambda o, d: pallas_bvh.traverse(
        grid, scene.triangles, o, d, 100.0, pk, pi, any_hit=True))
    timeit("traverse any-hit (primary dirs)", anyh, o, d)

    full = jax.jit(lambda o, d: pallas_bvh.intersect_scene_pallas(
        scene, o, d, pk, pi))
    timeit("intersect_scene (cand+kernel+hitfill)", full, o, d)

    key = jax.random.PRNGKey(0)
    timeit("full whitted frame", lambda: render_frame(scene, cam, cfg, key)[
        "image"])


if __name__ == "__main__":
    main()
