#!/usr/bin/env python
"""In-loop cost of the shading step's components on TPU."""
import time
import jax
import jax.numpy as jnp


def t_loop(label, step, seed0, n=10, reps=3):
    @jax.jit
    def run(seed):
        def body(i, carry):
            out = step(carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, seed)
    jax.block_until_ready(run(seed0))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(seed0))
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh
    from mobileraytracer_tpu.shaders import common, engine

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)
    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)
    hit = jax.block_until_ready(jax.jit(
        lambda o, d: pallas_bvh.intersect_scene_pallas(scene, o, d, pk, pi))(o, d))
    keys = jax.block_until_ready(
        jax.jit(lambda: sampling.ray_key(jax.random.PRNGKey(0), pids, 0))())

    t_loop("bind_material", lambda c: common.bind_material(
        scene, hit.replace(t=hit.t + c * 1e-30))[1], jnp.float32(0.0))

    t_loop("event_key x1", lambda c: sampling.event_key(
        keys, 1, 0)[:, 0].astype(jnp.float32) + c * 0, jnp.float32(0.0))

    def dl_no_shadow(c):
        nee = sampling.event_key(keys, 1, 1)
        ld, n = common.direct_lighting(
            scene, hit.replace(t=hit.t + c * 1e-30), nee, 1, shadows=False)
        return ld
    t_loop("direct_lighting (no shadow ray)", dl_no_shadow, jnp.float32(0.0))

    def occl(c):
        org = hit.point + c * 1e-30
        return pallas_bvh.occluded_pallas(
            scene, org, d, jnp.full((b,), 10.0, jnp.float32), pk, pi
        ).astype(jnp.float32)
    t_loop("occluded (pallas any-hit)", occl, jnp.float32(0.0))

    def closest(c):
        return pallas_bvh.intersect_scene_pallas(
            scene, o + c * 1e-30, d, pk, pi).t
    t_loop("closest (pallas)", closest, jnp.float32(0.0))

    # stack push/pop machinery
    s = cfg.stack_size
    state = engine.WalkState(
        sp=jnp.ones((b,), jnp.int32),
        st_org=jnp.zeros((b, s, 3), jnp.float32),
        st_dir=jnp.zeros((b, s, 3), jnp.float32),
        st_weight=jnp.zeros((b, s, 3), jnp.float32),
        st_depth=jnp.ones((b, s), jnp.int32),
        st_pkind=jnp.zeros((b, s), jnp.int32),
        st_pid=jnp.full((b, s), -1, jnp.int32),
        st_flags=jnp.zeros((b, s), jnp.int32),
        rgb=jnp.zeros((b, 3), jnp.float32),
        rays=jnp.zeros((b,), jnp.int32),
    )

    def poppush(c):
        st = state._replace(rgb=state.rgb + c * 1e-30)
        st, e, active = engine._pop(st)
        st = engine._push(st, active, e["org"], e["dirn"], e["weight"],
                          e["depth"], e["pkind"], e["pid"], e["flags"])
        st = engine._push(st, active, e["org"], e["dirn"], e["weight"],
                          e["depth"], e["pkind"], e["pid"], e["flags"])
        return st.rgb
    t_loop("pop + 2x push", poppush, jnp.float32(0.0))

    # reflect/refract/fresnel
    def spec(c):
        n2 = hit.normal + c * 1e-30
        r = common.reflect(d, n2)
        t2, ok = common.refract(d, n2, jnp.full((b,), 1.0 / 1.5, jnp.float32))
        fr = common.fresnel(d, n2, jnp.full((b,), 1.5, jnp.float32))
        return r + t2 + fr[:, None]
    t_loop("reflect+refract+fresnel", spec, jnp.float32(0.0))


if __name__ == "__main__":
    main()
