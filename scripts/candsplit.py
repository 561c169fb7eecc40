#!/usr/bin/env python
"""Sub-phase split of pallas_bvh._candidates on the conference proxy:
phase A (super lb + top_k) vs phase B (gather, lb, top_k)."""
import time

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    from phaseprof import cached_conference

    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh as pb
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.types import RenderConfig

    scene, cam, info = cached_conference()
    grid = scene.bvh
    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.device_put(o)
    d = jax.device_put(d)
    jax.block_until_ready((o, d))
    b = o.shape[0]
    ST = pb.ST
    nt = b // ST

    def ivals_fn(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                                jnp.where(d < 0, -1e-30, 1e-30), d)
        return pb._subtile_intervals(o, inv_d, nt)

    ivals = timeit("intervals", jax.jit(ivals_fn), o, d)

    sup_lo_hi = [(grid.super_lo[a][None, :], grid.super_hi[a][None, :])
                 for a in range(3)]

    def phase_a_lb(ivals):
        return pb._interval_entry_lb(ivals, sup_lo_hi)

    e_sup = timeit("A: super lb", jax.jit(phase_a_lb), ivals)

    s = grid.top_s

    def phase_a_topk(e):
        return jax.lax.top_k(-e, s)

    neg_s, sup_ids = timeit("A: top_k supers", jax.jit(phase_a_topk), e_sup)

    def phase_b_gather(sup_ids):
        return grid.blocks_packed[sup_ids]

    gb = timeit("B: gather packed rows", jax.jit(phase_b_gather), sup_ids)

    bps = grid.bps
    nc = s * bps

    def phase_b_lb(ivals, gb):
        f = lambda i: grid.packed_field(gb, i)
        lo_hi = [(f(0), f(3)), (f(1), f(4)), (f(2), f(5))]
        return pb._interval_entry_lb(ivals, lo_hi)

    lb = timeit("B: block lb", jax.jit(phase_b_lb), ivals, gb)

    m = min(grid.top_m, nc)

    def phase_b_topk(lb):
        return jax.lax.top_k(-lb, m)

    timeit("B: top_k blocks", jax.jit(phase_b_topk), lb)

    timeit("all: _candidates", jax.jit(
        lambda o, d: pb._candidates(grid, o, d)), o, d)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    main()
