#!/usr/bin/env python
"""Micro-profile of candidate-selection sub-ops and hit-fill gathers on TPU."""
import time
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.2f} ms")
    return out


def main():
    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh
    from mobileraytracer_tpu.ops.block_bvh import _entry_cw

    scene, cam, info = conference_proxy()
    scene = pallas_bvh.build(scene)
    grid = scene.bvh
    cfg = RenderConfig(width=512, height=512, spp=1)
    u, v, pids, inv = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.block_until_ready(o)
    b = o.shape[0]
    ST = pallas_bvh.ST
    nt = b // ST
    s = grid.top_s

    @jax.jit
    def phase_a(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                                jnp.where(d < 0, -1e-30, 1e-30), d)
        e_super = _entry_cw(
            o[:, 0][:, None], o[:, 1][:, None], o[:, 2][:, None],
            inv_d[:, 0][:, None], inv_d[:, 1][:, None], inv_d[:, 2][:, None],
            grid.super_lo[:, None, :], grid.super_hi[:, None, :])
        return jnp.min(e_super.reshape(nt, ST, -1), axis=1)

    e_super_t = timeit("phase A slab+reduce (B,K1)", phase_a, o, d)

    topk_a = jax.jit(lambda e: jax.lax.top_k(-e, s))
    neg_s, sup_ids = timeit("top_k A (nt,K1)->top_s", topk_a, e_super_t)

    approx_a = jax.jit(lambda e: jax.lax.approx_max_k(-e, s))
    timeit("approx_max_k A", approx_a, e_super_t)

    gather_b = jax.jit(lambda ids: grid.blocks_packed[ids])
    gb = timeit("phase B row gather (nt,s,BPS*8)", gather_b, sup_ids)

    @jax.jit
    def lb_fn(o, d, gb):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                                jnp.where(d < 0, -1e-30, 1e-30), d)
        gb2 = gb.reshape(nt, -1, 8)
        cb_lo = jnp.moveaxis(gb2[:, :, 0:3], 2, 0)
        cb_hi = jnp.moveaxis(gb2[:, :, 3:6], 2, 0)
        return pallas_bvh._interval_entry_lb(o, inv_d, cb_lo, cb_hi, nt)

    lb = timeit("interval LB (nt,nc)", lb_fn, o, d, gb)

    m = grid.top_m
    topk_b = jax.jit(lambda lb: jax.lax.top_k(-lb, m))
    timeit("top_k B (nt,nc)->top_m", topk_b, lb)
    approx_b = jax.jit(lambda lb: jax.lax.approx_max_k(-lb, m))
    timeit("approx_max_k B", approx_b, lb)

    # Hit-fill gather patterns over the triangle table.
    tris = scene.triangles
    n = tris.point_a.shape[0]
    ids = jnp.argsort(jnp.sin(jnp.arange(b, dtype=jnp.float32)))[:b] % n
    ids = ids.astype(jnp.int32)

    g1 = jax.jit(lambda ids: (tris.point_a[ids], tris.ab[ids], tris.ac[ids],
                              tris.normal_a[ids], tris.normal_b[ids],
                              tris.normal_c[ids], tris.mat_id[ids]))
    timeit("separate row gathers (7x (N,3)/(N,))", g1, ids)

    packed = jnp.concatenate(
        [tris.point_a, tris.ab, tris.ac, tris.normal_a, tris.normal_b,
         tris.normal_c, tris.mat_id[:, None].astype(jnp.float32),
         jnp.zeros((n, 13), jnp.float32)], axis=1)  # (N, 32)
    g2 = jax.jit(lambda ids: packed[ids])
    timeit("one packed row gather (N,32)", g2, ids)

    packed128 = jnp.concatenate([packed, jnp.zeros((n, 96), jnp.float32)], 1)
    g3 = jax.jit(lambda ids: packed128[ids])
    timeit("one packed row gather (N,128)", g3, ids)


if __name__ == "__main__":
    main()
