#!/usr/bin/env python
"""Separate per-dispatch overhead from true device time: each op is run
once-per-dispatch and N-times-inside-one-jit (lax.fori_loop with data dep)."""
import time
import jax
import jax.numpy as jnp
from functools import partial


def t_once(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    # 1. dispatch RTT: trivial op
    tiny = jnp.zeros((8, 128), jnp.float32)
    triv = jax.jit(lambda x: x + 1.0)
    print(f"trivial dispatch RTT: {t_once(triv, tiny)*1e3:.2f} ms")

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
    u, v, _, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.block_until_ready(o)
    b = o.shape[0]
    ST = pallas_bvh.ST
    nt = b // ST

    N = 10

    def loop(fn_step):
        """Runs fn_step N times with a data dependency, one dispatch."""
        @jax.jit
        def run(o, d):
            def body(i, carry):
                o2 = o + carry * 1e-9
                out = fn_step(o2, d)
                return jnp.sum(out) * 0.0
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        return run

    def phase_a(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                                jnp.where(d < 0, -1e-30, 1e-30), d)
        e_super = _entry_cw(
            o[:, 0][:, None], o[:, 1][:, None], o[:, 2][:, None],
            inv_d[:, 0][:, None], inv_d[:, 1][:, None], inv_d[:, 2][:, None],
            grid.super_lo[:, None, :], grid.super_hi[:, None, :])
        return jnp.min(e_super.reshape(nt, ST, -1), axis=1)

    dt = t_once(loop(phase_a), o, d, reps=3)
    print(f"phase A true: {dt/N*1e3:.2f} ms")

    e = jax.block_until_ready(jax.jit(phase_a)(o, d))

    def topk_a(o, d):
        e2 = e + jnp.sum(o) * 1e-30
        neg, ids = jax.lax.top_k(-e2, grid.top_s)
        return neg
    dt = t_once(loop(topk_a), o, d, reps=3)
    print(f"top_k A true: {dt/N*1e3:.2f} ms")

    cand = jax.jit(lambda o, d: pallas_bvh._candidates(grid, o, d))
    cg, cf, ce = jax.block_until_ready(cand(o, d))
    m = cg.shape[1]
    t0v = jnp.full((b,), 1e30, jnp.float32)
    rays8 = jnp.concatenate(
        [o, d, t0v[:, None], jnp.full((b, 1), -1.0, jnp.float32)], axis=1)

    def cand_step(o, d):
        a, bb, c = pallas_bvh._candidates(grid, o, d)
        return c
    dt = t_once(loop(cand_step), o, d, reps=3)
    print(f"candidates true: {dt/N*1e3:.2f} ms")

    @jax.jit
    def kern_loop(cg, cf, ce, rays8):
        def body(i, carry):
            r2 = rays8.at[0, 0].add(carry * 1e-12)
            t, sid = pallas_bvh._traverse_padded(grid.tb, cg, cf, ce, r2,
                                                 m, False, False)
            return jnp.sum(t) * 0.0
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    jax.block_until_ready(kern_loop(cg, cf, ce, rays8))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(kern_loop(cg, cf, ce, rays8))
    dt = (time.perf_counter() - t0) / 3
    print(f"pallas kernel true: {dt/N*1e3:.2f} ms")


if __name__ == "__main__":
    main()
