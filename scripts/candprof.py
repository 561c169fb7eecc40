#!/usr/bin/env python
"""Sub-op timing of pallas_bvh._candidates at the current MRT_SUBTILE."""
import time

import jax
import jax.numpy as jnp


def t_loop(label, step, n=10, reps=3):
    @jax.jit
    def run(seed):
        def body(i, carry):
            out = step(carry)
            return (jnp.sum(out[0] if isinstance(out, tuple) else out)
                    .astype(jnp.float32) * 1e-30)
        return jax.lax.fori_loop(0, n, body, seed)
    jax.block_until_ready(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from phaseprof import cached_conference

    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.types import RenderConfig

    scene, cam, info = cached_conference()
    grid = scene.bvh
    cfg = RenderConfig(width=512, height=512, spp=1)
    u, v, _, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o = jax.block_until_ready(o)
    ST = pallas_bvh.ST
    b = o.shape[0]
    nt = b // ST
    s, bps = grid.top_s, grid.bps
    nc = s * bps
    print(f"ST={ST} nt={nt} K1={grid.num_supers} nc={nc} top_m={grid.top_m}")

    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                            jnp.where(d < 0, -1e-30, 1e-30), d)

    def ivals_fn(c):
        return pallas_bvh._subtile_intervals(o + c * 1e-30, inv_d, nt)[0][0]
    t_loop("subtile intervals", ivals_fn)

    ivals = pallas_bvh._subtile_intervals(o, inv_d, nt)
    sup_lo_hi = [(grid.super_lo[a][None, :], grid.super_hi[a][None, :])
                 for a in range(3)]

    def phase_a(c):
        iv = [(a + c * 1e-30, bb, cc, dd) for (a, bb, cc, dd) in ivals]
        return pallas_bvh._interval_entry_lb(iv, sup_lo_hi)
    t_loop("phase A interval LB (nt,K1)", phase_a)

    e_super = pallas_bvh._interval_entry_lb(ivals, sup_lo_hi)
    t_loop("top_k A (nt,K1)->top_s",
           lambda c: jax.lax.top_k(-(e_super + c * 1e-30), s)[1])

    sup_ids = jax.lax.top_k(-e_super, s)[1]
    t_loop("phase B row gather (nt,s,8*BPS)",
           lambda c: grid.blocks_packed[sup_ids + c.astype(jnp.int32) * 0])

    gb = grid.blocks_packed[sup_ids]
    f = lambda i: grid.packed_field(gb, i)
    lo_hi = [(f(0), f(3)), (f(1), f(4)), (f(2), f(5))]

    def phase_b_lb(c):
        iv = [(a + c * 1e-30, bb, cc, dd) for (a, bb, cc, dd) in ivals]
        return pallas_bvh._interval_entry_lb(iv, lo_hi)
    t_loop("phase B interval LB (nt,nc)", phase_b_lb)

    lb = pallas_bvh._interval_entry_lb(ivals, lo_hi)
    m = min(grid.top_m, nc)
    t_loop(f"top_k B (nt,{nc})->{m}",
           lambda c: jax.lax.top_k(-(lb + c * 1e-30), m)[0])
    t_loop("full _candidates", lambda c: pallas_bvh._candidates(
        grid, o + c * 1e-30, d))

    # hit fill cost
    from mobileraytracer_tpu.ops import intersect as nv
    ids = jax.random.randint(jax.random.PRNGKey(0), (b,), 0,
                             grid.tri_attr.shape[0], jnp.int32)
    t_loop("tri_attr gather (B rows of 32)",
           lambda c: grid.tri_attr[ids + c.astype(jnp.int32) * 0])


if __name__ == "__main__":
    main()
