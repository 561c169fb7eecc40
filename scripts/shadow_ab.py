#!/usr/bin/env python
"""A/B the NEE shadow-pass formulations on the conference proxy (TPU).

Round-4 frame breakdown put NEE (sampling + shadow any-hit + refill) at
~50 ms of the ~120 ms Whitted frame.  Round-5 hypothesis: with a shared
per-group light point, tracing the occlusion segments REVERSED (from the
light point toward the surfaces) collapses the traversal's interval hulls
from [hit-point box x direction box] to the exact shadow cone, shrinking
candidate windows and the unresolved-ray refill tail.

Variants measured (same estimator, same image up to fp-boundary flips):
  fwd-banded   round-4 production: forward rays, banded 16-ray subtiles
  rev-banded   reversed rays, banded kernel
  rev-tile     reversed rays, tile-MT kernel (128-ray shared candidates)

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/shadow_ab.py
"""
import time

import jax
import jax.numpy as jnp

from profile import cached_conference


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.renderer import _pixel_order
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
        print(f"{label:44s} {(tn-t1)/(n-1)*1e3:9.2f} ms", flush=True)

    def vary_o(i):
        return o + d * (0.003 * i.astype(jnp.float32))

    def closest_body(k, i):
        h = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
        return jnp.sum(h.t)

    prof("closest tile-MT (baseline for reference)", closest_body)

    def nee_body(reverse, coherent):
        def body(k, i):
            kk = sampling.ray_key(k, pids, 0)
            hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
            nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
            diffuse = ~hit.missed
            ld, ns = common.direct_lighting(
                scene, hit, nee_keys, cfg.samples_light, shadows=True,
                occluded_fn=tracer.occluded, mask=diffuse,
                share_mask=jnp.ones((b,), bool), share_width=cfg.nee_share,
                reverse=reverse, coherent=coherent)
            return jnp.sum(ld)
        return body

    prof("closest + NEE fwd-banded (round-4 prod)", nee_body(False, False))
    prof("closest + NEE rev-banded", nee_body(True, False))
    prof("closest + NEE rev-tile", nee_body(True, True))

    # Estimator sanity: occlusion flips only at fp boundaries, so the two
    # formulations' summed direct light must agree closely.
    kk = sampling.ray_key(key, pids, 0)
    hit = tracer.closest(scene, o, d, pk, pi, coherent=True)
    nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
    diffuse = ~hit.missed
    outs = {}
    for name, (rev, coh) in {"fwd": (False, False), "revb": (True, False),
                             "revt": (True, True)}.items():
        ld, _ = common.direct_lighting(
            scene, hit, nee_keys, cfg.samples_light, shadows=True,
            occluded_fn=tracer.occluded, mask=diffuse,
            share_mask=jnp.ones((b,), bool), share_width=cfg.nee_share,
            reverse=rev, coherent=coh)
        outs[name] = jax.device_get(jnp.where(diffuse[:, None], ld, 0.0))
    import numpy as np
    for name in ("revb", "revt"):
        a, r = outs[name], outs["fwd"]
        nz = np.abs(a - r).max(axis=1) > 1e-5
        print(f"{name} vs fwd: {nz.mean()*100:.4f}% lanes differ "
              f"(expect ~0, fp-boundary only)", flush=True)


if __name__ == "__main__":
    main()
