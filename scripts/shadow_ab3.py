#!/usr/bin/env python
"""Round-5 shadow-pass A/B v3 (TPU, conference proxy): the production
reversed path with downsampled NEE sampling + shadow-tuned selection
windows, against variants.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/shadow_ab3.py
"""
import time

import jax
import jax.numpy as jnp

from profile import cached_conference


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh as pb
    from mobileraytracer_tpu.renderer import _pixel_order, render_frame
    from mobileraytracer_tpu.shaders import common, engine
    from mobileraytracer_tpu.types import RenderConfig

    t0 = time.perf_counter()
    scene, cam, info = cached_conference()
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

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

    def fetch_time(fn, *args):
        t0 = time.perf_counter()
        float(fn(*args))
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
        print(f"{label:56s} {(tn-t1)/(n-1)*1e3:9.2f} ms", flush=True)

    def vary_o(i):
        return o + d * (0.003 * i.astype(jnp.float32))

    # Production path: closest + NEE through the engine call shape
    # (downsampled sampling + reversed + SHADOW_SEL banded).
    def nee_prod(k, i):
        kk = sampling.ray_key(k, pids, 0)
        hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
        nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
        diffuse = ~hit.missed
        ld, ns = common.direct_lighting(
            scene, hit, nee_keys, cfg.samples_light, shadows=True,
            occluded_fn=tracer.occluded, mask=diffuse,
            share_mask=jnp.ones((b,), bool), share_width=cfg.nee_share,
            reverse=True, coherent=True, share_all=True)
        return jnp.sum(ld)

    prof("closest + NEE production (rev, ds-keys, SHADOW_SEL)", nee_prod)

    # Variant shells: same sampling, different occlusion call.
    def make_var(occ):
        def body(k, i):
            kk = sampling.ray_key(k, pids, 0)
            hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
            nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
            diffuse = ~hit.missed
            ld, ns = common.direct_lighting(
                scene, hit, nee_keys, cfg.samples_light, shadows=True,
                occluded_fn=occ, mask=diffuse,
                share_mask=jnp.ones((b,), bool), share_width=cfg.nee_share,
                reverse=True, coherent=True, share_all=True)
            return jnp.sum(ld)
        return body

    def occ_sel(mode, **sel):
        def f(scene, o_, d_, md, pk_, pi_, coherent=False):
            return pb.occluded_pallas(scene, o_, d_, md, pk_, pi_,
                                      mode=mode, **sel)
        return f

    prof("  variant banded default windows (16/32/48)",
         make_var(occ_sel("banded")))
    prof("  variant banded sel_st=32 s16 m48",
         make_var(occ_sel("banded", sel_st=32, top_s=16, top_m=48)))
    prof("  variant banded sel_st=64 s16 m24",
         make_var(occ_sel("banded", sel_st=64, top_s=16, top_m=24)))
    prof("  variant tilemt m=96",
         make_var(occ_sel("tilemt", top_s=16, top_m=96)))
    prof("  variant tilemt m=128",
         make_var(occ_sel("tilemt", top_s=24, top_m=128)))

    def frame_body(k, i):
        out = render_frame(scene, cam, cfg, k)
        return jnp.sum(out["image"]) + out["rays"]

    prof("full whitted frame 512x512 1spp (production)", frame_body, n=8)

    # rays/s headline recompute
    @jax.jit
    def frames(n):
        def body(i, carry):
            out = render_frame(scene, cam, cfg, jax.random.fold_in(key, i))
            return (carry[0] * 1e-20 + jnp.sum(out["image"]),
                    carry[1] + out["rays"])
        return jax.lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros((), jnp.int32)))
    _, r1 = frames(1)
    rays_per_frame = int(r1)
    t0 = time.perf_counter(); float(frames(1)[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); _, rn = frames(9)
    total = int(rn); tn = time.perf_counter() - t0
    dt = (tn - t1) / 8
    print(f"rays/s: {total // 9 / dt / 1e6:.2f} M (frame {dt*1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
