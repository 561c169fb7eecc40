#!/usr/bin/env python
"""Round-5 shadow A/B v4 (TPU): bf16 selection + resident-table any-hit
kernel vs the banded DMA kernel.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/shadow_ab4.py
"""
import time

import jax
import jax.numpy as jnp

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
    print(f"setup {time.perf_counter()-t0:.1f}s "
          f"parts={-(-grid.tb.shape[0] // pb.NBP)}", flush=True)

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
        print(f"{label:52s} {(tn-t1)/(n-1)*1e3:9.2f} ms", flush=True)

    def vary_o(i):
        return o + d * (0.003 * i.astype(jnp.float32))

    def make_var(occ):
        def body(k, i):
            kk = sampling.ray_key(k, pids, 0)
            hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
            nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
            diffuse = ~hit.missed
            ld, ns = common.direct_lighting(
                scene, hit, nee_keys, cfg.samples_light, shadows=True,
                occluded_fn=occ, mask=diffuse,
                share_mask=None, share_width=cfg.nee_share,
                reverse=True, coherent=True, share_all=True)
            return jnp.sum(ld)
        return body

    def occ_sel(mode, **sel):
        def f(scene, o_, d_, md, pk_, pi_, coherent=False):
            return pb.occluded_pallas(scene, o_, d_, md, pk_, pi_,
                                      mode=mode, **sel)
        return f

    def closest_only(k, i):
        hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
        return jnp.sum(hit.t)

    prof("closest tile-MT (bf16 selection)", closest_only)
    prof("closest+NEE banded (bf16 selection)",
         make_var(occ_sel("banded")))
    prof("closest+NEE RESIDENT", make_var(occ_sel("resident")))
    prof("closest+NEE RESIDENT sel_st=32 s32 m48",
         make_var(occ_sel("resident", sel_st=32)))


if __name__ == "__main__":
    main()
