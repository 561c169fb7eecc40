#!/usr/bin/env python
"""True (in-loop) costs of phase-B sub-ops and epilogue gathers, plus
candidate layout variants."""
import time
import jax
import jax.numpy as jnp


def t_loop(label, make_step, n=10, reps=3):
    @jax.jit
    def run(seed):
        def body(i, carry):
            out = make_step(carry)
            return jnp.sum(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, seed)
    jax.block_until_ready(run(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{label:48s} {dt*1e3:9.2f} ms")
    return dt


def main():
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.renderer import _pixel_order
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.types import RenderConfig
    from mobileraytracer_tpu.ops import pallas_bvh

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
    s = grid.top_s
    bps = grid.bps
    nc = s * bps
    k1 = grid.num_supers

    key = jax.random.PRNGKey(0)
    sup_ids = jax.random.randint(key, (nt, s), 0, k1, jnp.int32)

    # Current layout: (K1, BPS*8) interleaved rows.
    bp_cur = grid.blocks_packed
    t_loop("gather interleaved (K1,128) rows",
           lambda c: bp_cur[(sup_ids + c.astype(jnp.int32) * 0)])

    # Component-grouped layout: (K1, 8*BPS) grouped [lox*BPS][loy*BPS]...
    bp_grp = jnp.asarray(
        jnp.moveaxis(bp_cur.reshape(k1, bps, 8), 2, 1).reshape(k1, 8 * bps))

    def phase_b_grouped(c):
        g = bp_grp[(sup_ids + c.astype(jnp.int32) * 0)]      # (nt, s, 128)
        comps = [g[:, :, f * bps:(f + 1) * bps].reshape(nt, nc)
                 for f in range(8)]
        lox, loy, loz, hix, hiy, hiz, first, count = comps
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        res = None
        for a, (lo, hi) in enumerate([(lox, hix), (loy, hiy), (loz, hiz)]):
            oa = o[:, a].reshape(nt, ST)
            ia = inv_d[:, a].reshape(nt, ST)
            o0 = jnp.min(oa, 1)[:, None]
            o1 = jnp.max(oa, 1)[:, None]
            i0 = jnp.min(ia, 1)[:, None]
            i1 = jnp.max(ia, 1)[:, None]
            lo_min = jnp.minimum(jnp.minimum((lo - o1) * i0, (lo - o1) * i1),
                                 jnp.minimum((lo - o0) * i0, (lo - o0) * i1))
            hi_min = jnp.minimum(jnp.minimum((hi - o1) * i0, (hi - o1) * i1),
                                 jnp.minimum((hi - o0) * i0, (hi - o0) * i1))
            near = jnp.minimum(lo_min, hi_min)
            res = near if res is None else jnp.maximum(res, near)
        return jnp.where(count > 0, res, jnp.inf)

    t_loop("phase B grouped: gather+slice+LB -> (nt,nc)", phase_b_grouped)

    lb = jax.block_until_ready(jax.jit(phase_b_grouped)(jnp.float32(0.0)))

    m = grid.top_m
    t_loop("top_k B exact (nt,512)->48",
           lambda c: jax.lax.top_k(-(lb + c * 1e-30), m)[0])
    t_loop("approx_max_k B (nt,512)->48",
           lambda c: jax.lax.approx_max_k(-(lb + c * 1e-30), m)[0])
    t_loop("sort (nt,512)",
           lambda c: jnp.sort(lb + c * 1e-30, axis=1))
    t_loop("argsort (nt,512)",
           lambda c: jnp.argsort(lb + c * 1e-30, axis=1))

    # mini top-4 within super (nt, s, 16) -> then top_k over (nt, 128)
    def mini4(c):
        lb2 = (lb + c * 1e-30).reshape(nt, s, bps)
        neg, idx = jax.lax.top_k(-lb2, 4)         # (nt, s, 4)
        flat = -neg.reshape(nt, s * 4)
        neg2, idx2 = jax.lax.top_k(-flat, m)
        return neg2
    t_loop("mini top4/super + top_k (nt,128)->48", mini4)

    # suffix-min (for order-free exactness)
    t_loop("suffix cummin (nt,512)",
           lambda c: jnp.flip(jax.lax.cummin(jnp.flip(lb + c * 1e-30, 1), axis=1), 1))

    # Epilogue variants.
    tris = scene.triangles
    n = tris.point_a.shape[0]
    ids = (jax.random.randint(key, (b,), 0, n, jnp.int32))
    packed128 = jnp.zeros((n, 128), jnp.float32)

    t_loop("tri gather (N,128) rows, B rows",
           lambda c: packed128[(ids + c.astype(jnp.int32) * 0)])
    packed32 = jnp.zeros((n, 32), jnp.float32)
    t_loop("tri gather (N,32) rows, B rows",
           lambda c: packed32[(ids + c.astype(jnp.int32) * 0)])

    # one-hot matmul epilogue for small tables (lights: 8 rows)
    ltab = jnp.zeros((8, 16), jnp.float32)
    lid = jax.random.randint(key, (b,), 0, 8, jnp.int32)

    def onehot_mm(c):
        oh = jax.nn.one_hot(lid, 8, dtype=jnp.float32)
        return (oh @ (ltab + c * 1e-30))
    t_loop("one-hot matmul (B,8)@(8,16)", onehot_mm)


if __name__ == "__main__":
    main()
