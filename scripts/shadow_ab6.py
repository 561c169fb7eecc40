#!/usr/bin/env python
"""Round-5 shadow A/B v6 (TPU): pure top_s reduction for the reversed
shadow pass (phase-B gather traffic is proportional to top_s; the earlier
top_s=16 experiment was confounded with sel_st=32 + top_m=24).

Also prints the per-subtile candidate-SUPER count distribution, which
decides how small top_s can go before the super cutoff starts feeding
the refill.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/shadow_ab6.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from profile import cached_conference


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh as pb
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.shaders import common, engine
    from mobileraytracer_tpu.types import RenderConfig

    t0 = time.perf_counter()
    scene, cam, info = cached_conference()
    grid = scene.bvh
    print(f"setup {time.perf_counter()-t0:.1f}s supers={grid.num_supers}",
          flush=True)

    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH,
                       nee_share=128)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)
    key = jax.random.PRNGKey(0)
    tracer = engine.make_tracer(cfg)

    def fetch_time(fn, *a):
        t0 = time.perf_counter()
        float(fn(*a))
        return time.perf_counter() - t0

    def prof(label, body, n=8):
        @jax.jit
        def run(n_arr):
            def f(i, carry):
                return carry * 1e-20 + body(jax.random.fold_in(key, i), i)
            return jax.lax.fori_loop(0, n_arr, f, jnp.zeros(()))
        float(run(1))
        t1 = fetch_time(run, 1)
        tn = fetch_time(run, n)
        print(f"{label:48s} {(tn-t1)/(n-1)*1e3:9.2f} ms", flush=True)

    def vary_o(i):
        return o + d * (0.003 * i.astype(jnp.float32))

    # ---- super-count stats on the reversed shadow batch -----------------
    def shadow_rays_fn(k):
        kk = sampling.ray_key(k, pids, 0)
        hit = tracer.closest(scene, o, d, pk, pi, coherent=True)
        nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
        keys_ds = nee_keys.reshape(b // 128, 128, -1)[:, 0]
        kp = jax.vmap(jax.random.fold_in, (0, None))(keys_ds, 0)
        kpt = jax.vmap(jax.random.fold_in, (0, None))(keys_ds, 1)
        lidx = jax.vmap(sampling.pick_light, (0, None))(kp, scene.lights.num)
        p = jax.vmap(sampling.sample_triangle_point)(
            kpt, scene.lights.tri_a[lidx], scene.lights.tri_ab[lidx],
            scene.lights.tri_ac[lidx])
        lpos = jnp.repeat(jnp.where(
            (scene.lights.kind[lidx] == C.LIGHT_AREA)[:, None], p,
            scene.lights.position[lidx]), 128, 0)
        to_l = lpos - hit.point
        dist = jnp.sqrt(jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-30))
        ldir = to_l / jnp.maximum(dist[:, None], 1e-30)
        live = (~hit.missed) & (jnp.sum(hit.normal * ldir, -1) > 0)
        org_s, dir_s = common.park_dead_lanes(lpos, -ldir, live)
        return org_s, dir_s, jnp.maximum(dist - C.EPSILON, 0.0)

    org_s, dir_s, md = shadow_rays_fn(key)
    rays, bp = pb._pack_rays(org_s, dir_s, md, pk, pi, pb.GROUP * pb.ST)
    nt0 = bp // pb.ST
    inv_d = 1.0 / jnp.where(jnp.abs(rays[:, 3:6]) < 1e-30, 1e-30,
                            rays[:, 3:6])
    ivals = pb._subtile_intervals(rays[:, 0:3], inv_d, nt0, pb.ST)
    sup_lo_hi = [(grid.super_lo[a][None, :], grid.super_hi[a][None, :])
                 for a in range(3)]
    e_sup = pb._interval_entry_lb(ivals, sup_lo_hi)
    cap0 = jnp.max(rays[:, 6].reshape(nt0, pb.ST), axis=1)
    e_sup = jnp.where(e_sup >= cap0[:, None], jnp.inf, e_sup)
    cnt = np.asarray(jnp.sum(jnp.isfinite(e_sup), axis=1))
    print(f"candidate supers/subtile: mean {cnt.mean():.1f} "
          f"p50 {np.percentile(cnt, 50):.0f} p95 {np.percentile(cnt, 95):.0f} "
          f"p99 {np.percentile(cnt, 99):.0f} max {cnt.max()}", flush=True)

    # ---- A/B ------------------------------------------------------------
    def make_var(**sel):
        def occ(scene, o_, d_, md_, pk_, pi_, coherent=False):
            return pb.occluded_pallas(scene, o_, d_, md_, pk_, pi_,
                                      mode="banded", **sel)
        def body(k, i):
            kk = sampling.ray_key(k, pids, 0)
            hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
            nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
            ld, ns = common.direct_lighting(
                scene, hit, nee_keys, cfg.samples_light, shadows=True,
                occluded_fn=occ, mask=~hit.missed, share_mask=None,
                share_width=cfg.nee_share, reverse=True, coherent=True,
                share_all=True)
            return jnp.sum(ld)
        return body

    prof("closest+NEE top_s=32 m=48 (prod)", make_var())
    prof("closest+NEE top_s=16 m=48", make_var(top_s=16))
    prof("closest+NEE top_s=24 m=48", make_var(top_s=24))
    prof("closest+NEE top_s=16 m=32", make_var(top_s=16, top_m=32))


if __name__ == "__main__":
    main()
