#!/usr/bin/env python
"""Distribution of traversal walk lengths (blocks visited per subtile) for
primary closest-hit and NEE shadow batches on the conference proxy."""
import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh
    from mobileraytracer_tpu.shaders import common

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)
    grid = scene.bvh
    cfg = RenderConfig(width=512, height=512, spp=1)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)
    big = jnp.full((b,), C.RAY_LENGTH_MAX, jnp.float32)

    def describe(label, steps):
        st = np.asarray(steps).reshape(-1, pallas_bvh.ST)[:, 0]
        print(f"{label:28s} mean={st.mean():6.2f} p50={np.percentile(st,50):5.1f} "
              f"p90={np.percentile(st,90):5.1f} p99={np.percentile(st,99):5.1f} "
              f"max={st.max():5.1f} (top_m={grid.top_m})")

    t, sid, steps = jax.jit(
        lambda o, d: pallas_bvh.traverse(grid, scene.triangles, o, d, big,
                                         pk, pi, with_steps=True))(o, d)
    describe("primary closest", steps)

    # NEE shadow batch from the primary hits.
    hit = jax.jit(lambda o, d: pallas_bvh.intersect_scene_pallas(
        scene, o, d, pk, pi))(o, d)
    keys = sampling.ray_key(jax.random.PRNGKey(0), pids, 0)

    k_pick = jax.vmap(jax.random.fold_in, (0, None))(keys, 0)
    st16 = C.SUBTILE
    k_sub = k_pick.reshape(b // st16, st16, -1)[:, 0]
    k_pick = jnp.repeat(k_sub, st16, axis=0)
    k_point = jax.vmap(jax.random.fold_in, (0, None))(keys, 1)
    lidx = jax.vmap(sampling.pick_light, (0, None))(k_pick, scene.lights.num)
    p_area = jax.vmap(sampling.sample_triangle_point)(
        k_point, scene.lights.tri_a[lidx], scene.lights.tri_ab[lidx],
        scene.lights.tri_ac[lidx])
    kind = scene.lights.kind[lidx]
    lpos = jnp.where((kind == C.LIGHT_AREA)[:, None], p_area,
                     scene.lights.position[lidx])
    to_l = lpos - hit.point
    dist = jnp.linalg.norm(to_l, axis=-1)
    ldir = to_l / jnp.maximum(dist[:, None], 1e-30)
    live = (jnp.sum(hit.normal * ldir, -1) > 0) & ~hit.missed
    org_t, dir_t = common.park_dead_lanes(hit.point, ldir, live)

    t2, sid2, steps2 = jax.jit(
        lambda o2, d2: pallas_bvh.traverse(
            grid, scene.triangles, o2, d2, dist, hit.prim_kind, hit.prim_id,
            any_hit=True, with_steps=True))(org_t, dir_t)
    describe("NEE shadow (any-hit)", steps2)

    # secondary bounce: specular reflections from primary hits
    rdir = common.reflect(d, hit.normal)
    live2 = ~hit.missed
    o3, d3 = common.park_dead_lanes(hit.point, rdir, live2)
    t3, sid3, steps3 = jax.jit(
        lambda o3, d3: pallas_bvh.traverse(grid, scene.triangles, o3, d3,
                                           big, hit.prim_kind, hit.prim_id,
                                           with_steps=True))(o3, d3)
    describe("secondary reflect", steps3)


if __name__ == "__main__":
    main()
