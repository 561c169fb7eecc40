#!/usr/bin/env python
"""Shadow-pass breakdown on the conference proxy (TPU): where do the
~85 ms of reversed-banded NEE occlusion actually go?

Measures, for the first-bounce shared-light shadow batch (reversed):
  - candidate-window selection cost (XLA phases A/B)
  - banded any-hit kernel cost (window 1 only, refill skipped)
  - refill cost (the full occluded call minus the above)
  - per-subtile candidate-count distribution (does top_m=48 cover the
    cones?), window-1 rounds, unresolved-ray counts

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/shadow_ab2.py
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

    ST = C.SUBTILE

    def shadow_batch(k, i):
        """Reversed shadow segments for iteration-variant primaries."""
        o_i = o + d * (0.003 * i.astype(jnp.float32))
        hit = tracer.closest(scene, o_i, d, pk, pi, coherent=True)
        kk = sampling.ray_key(k, pids, 0)
        nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
        k_pick = jax.vmap(jax.random.fold_in, (0, None))(nee_keys, 0)
        k_point = jax.vmap(jax.random.fold_in, (0, None))(nee_keys, 1)
        sw = 128
        k_pick = jnp.repeat(k_pick.reshape(b // sw, sw, -1)[:, 0], sw, 0)
        k_point = jnp.repeat(k_point.reshape(b // sw, sw, -1)[:, 0], sw, 0)
        lidx = jax.vmap(sampling.pick_light, (0, None))(k_pick,
                                                        scene.lights.num)
        kind = scene.lights.kind[lidx]
        p_area = jax.vmap(sampling.sample_triangle_point)(
            k_point, scene.lights.tri_a[lidx], scene.lights.tri_ab[lidx],
            scene.lights.tri_ac[lidx])
        lpos = jnp.where((kind == C.LIGHT_AREA)[:, None], p_area,
                         scene.lights.position[lidx])
        to_light = lpos - hit.point
        dist = jnp.linalg.norm(to_light, axis=-1)
        ldir = to_light / jnp.maximum(dist[:, None], 1e-30)
        cos_nl = jnp.sum(hit.normal * ldir, -1)
        live = (~hit.missed) & (cos_nl > 0)
        org_s, dir_s = common.park_dead_lanes(lpos, -ldir, live)
        md = jnp.maximum(dist - C.EPSILON, 0.0)
        return org_s, dir_s, md, hit

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

    def base_body(k, i):
        org_s, dir_s, md, hit = shadow_batch(k, i)
        return jnp.sum(md)

    prof("closest + NEE sampling only (no occlusion)", base_body)

    def cand_body(k, i):
        org_s, dir_s, md, hit = shadow_batch(k, i)
        rays, bp = pb._pack_rays(org_s, dir_s, md, pk, pi,
                                 pb.GROUP * pb.ST)
        nt0 = bp // ST
        cap0 = jnp.max(rays[:, 6].reshape(nt0, ST), axis=1)
        cg, cf, ce, cut = pb._candidates(grid, rays[:, 0:3], rays[:, 3:6],
                                         cap=cap0)
        return jnp.sum(ce) + jnp.sum(cut)

    prof("  + candidate windows (phases A/B)", cand_body)

    def window1_body(k, i):
        org_s, dir_s, md, hit = shadow_batch(k, i)
        rays, bp = pb._pack_rays(org_s, dir_s, md, pk, pi,
                                 pb.GROUP * pb.ST)
        nt0 = bp // ST
        cap0 = jnp.max(rays[:, 6].reshape(nt0, ST), axis=1)
        cg, cf, ce, cut = pb._candidates(grid, rays[:, 0:3], rays[:, 3:6],
                                         cap=cap0)
        m = cg.shape[1]
        t, sid, steps = pb._banded_balanced(grid, cg, ce, rays, m, True,
                                            pb._interpret())
        return jnp.sum(t) + jnp.sum(steps)

    prof("  + banded any-hit kernel (window 1, no refill)", window1_body)

    def occl_body(k, i):
        org_s, dir_s, md, hit = shadow_batch(k, i)
        blocked = pb.occluded_pallas(scene, org_s, dir_s, md, pk, pi,
                                     mode="banded")
        return jnp.sum(blocked)

    prof("  + full occluded (window 1 + refill)", occl_body)

    # ---- statistics (single run, fetched) -------------------------------
    org_s, dir_s, md, hit = shadow_batch(key, jnp.zeros((), jnp.int32))
    rays, bp = pb._pack_rays(org_s, dir_s, md, pk, pi, pb.GROUP * pb.ST)
    nt0 = bp // ST
    cap0 = jnp.max(rays[:, 6].reshape(nt0, ST), axis=1)
    cg, cf, ce, cut = pb._candidates(grid, rays[:, 0:3], rays[:, 3:6],
                                     cap=cap0)
    m = cg.shape[1]
    counts = np.asarray(jnp.sum(ce < pb._BIG * 0.5, axis=1))
    print(f"window m={m}: cand/subtile mean {counts.mean():.1f} "
          f"p50 {np.percentile(counts, 50):.0f} "
          f"p95 {np.percentile(counts, 95):.0f} "
          f"full-window frac {(counts >= m).mean()*100:.1f}%", flush=True)

    t, sid, steps = pb._banded_balanced(grid, cg, ce, rays, m, True,
                                        pb._interpret())
    steps = np.asarray(steps)
    print(f"window-1 rounds/program mean {steps.mean():.1f} "
          f"p95 {np.percentile(steps, 95):.0f} "
          f"max {steps.max():.0f}", flush=True)

    floor_r = np.asarray(jnp.repeat(cut, ST))
    tt = np.asarray(t)
    mdp = np.asarray(rays[:, 6])
    occluded = tt < mdp
    unresolved = (~occluded) & (floor_r < tt)
    print(f"occluded {occluded.mean()*100:.1f}%  "
          f"unresolved-after-window-1 {unresolved.sum()} lanes "
          f"({unresolved.mean()*100:.2f}%)", flush=True)

    # forward comparison: same stats with forward segments
    hit_pt = hit.point
    to_l = org_s  # reversed origin == light point
    fdir = -dir_s
    f_rays, _ = pb._pack_rays(hit_pt, fdir, md, pk, pi, pb.GROUP * pb.ST)
    fcap = jnp.max(f_rays[:, 6].reshape(nt0, ST), axis=1)
    fcg, fcf, fce, fcut = pb._candidates(grid, f_rays[:, 0:3],
                                         f_rays[:, 3:6], cap=fcap)
    fcounts = np.asarray(jnp.sum(fce < pb._BIG * 0.5, axis=1))
    print(f"forward cand/subtile mean {fcounts.mean():.1f} "
          f"p95 {np.percentile(fcounts, 95):.0f} "
          f"full-window frac {(fcounts >= m).mean()*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
