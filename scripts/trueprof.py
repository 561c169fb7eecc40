#!/usr/bin/env python
"""Honest TPU phase profiler for the conference Whitted frame.

The tunneled axon backend makes host-side timing lie two ways:
`block_until_ready` returns without waiting, and every value fetch pays
~0.4 s of relay latency.  So each phase is repeated N times *inside one
executable* (a `lax.fori_loop` whose carry perturbs the inputs, forcing
sequential execution and defeating CSE), and exactly one scalar is
fetched.  Phase time = (T(N) - T(0-ish)) / N.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site python scripts/trueprof.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch_time(fn, *args):
    t0 = time.perf_counter()
    v = float(fn(*args))
    return time.perf_counter() - t0, v


def profile(label, make_body, o, d, n=16):
    """make_body(o, d) -> scalar; the loop perturbs o by carry*1e-12."""

    @jax.jit
    def run(o, d, n_arr):
        def body(i, carry):
            s = make_body(o + carry * 1e-12, d)
            return s * 1e-20 + 1.0
        return jax.lax.fori_loop(0, n_arr, body, jnp.zeros(()))

    # Warm: compile + one timed run at n and at 1 to subtract overhead.
    float(run(o, d, 1))
    t1, _ = fetch_time(run, o, d, 1)
    tn, _ = fetch_time(run, o, d, n)
    per = (tn - t1) / (n - 1)
    print(f"{label:46s} {per*1e3:9.2f} ms   (t1={t1*1e3:7.1f} tn={tn*1e3:8.1f})",
          flush=True)
    return per


def main():
    from phaseprof import cached_conference

    from mobileraytracer_tpu import constants as C
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh as pb
    from mobileraytracer_tpu.renderer import _pixel_order, render_frame
    from mobileraytracer_tpu.shaders import engine
    from mobileraytracer_tpu.types import RenderConfig

    scene, cam, info = cached_conference()
    scene = jax.device_put(scene)
    grid = scene.bvh
    cfg = RenderConfig(width=512, height=512, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_BVH)
    u, v, pids, _ = _pixel_order(cfg)
    o, d = generate_rays(cam, u, v, jnp.zeros_like(u), jnp.zeros_like(v))
    o, d = jax.device_put((o, d))
    b = o.shape[0]
    pk = jnp.zeros((b,), jnp.int32)
    pi = jnp.full((b,), -1, jnp.int32)
    key = jax.random.PRNGKey(0)

    def cand_body(o, d):
        cg, cf, ce = pb._candidates(grid, o, d)
        return jnp.sum(ce)

    profile("candidates (A+B XLA)", cand_body, o, d)

    def trav_body(o, d):
        t, i = pb.traverse(grid, scene.triangles, o, d, C.RAY_LENGTH_MAX,
                           pk, pi)
        return jnp.sum(t)

    profile("traverse closest (cand+kernel)", trav_body, o, d)

    # kernel only: candidates hoisted out of the loop
    cg, cf, ce = jax.jit(lambda o, d: pb._candidates(grid, o, d))(o, d)
    t0b = jnp.broadcast_to(jnp.asarray(C.RAY_LENGTH_MAX), (b,))
    prev_f = jnp.full((b,), -1.0)
    rays8 = jnp.concatenate([o, d, t0b[:, None], prev_f[:, None]], axis=1)
    m = cg.shape[1]

    def kern_body(r8, _unused):
        t, sid, steps = pb._traverse_padded(grid.tb, cg, cf, ce, r8, m,
                                            False, False)
        return jnp.sum(t)

    profile("kernel only (fixed candidates)", kern_body, rays8, rays8)

    def any_body(o, d):
        t, i = pb.traverse(grid, scene.triangles, o, d, 100.0, pk, pi,
                           any_hit=True)
        return jnp.sum(t)

    profile("traverse any-hit", any_body, o, d)

    def isect_body(o, d):
        h = pb.intersect_scene_pallas(scene, o, d, pk, pi)
        return jnp.sum(h.t)

    profile("intersect_scene (cand+kernel+fill)", isect_body, o, d)

    @jax.jit
    def frames(n_arr):
        def body(i, carry):
            out = render_frame(scene, cam, cfg, jax.random.fold_in(key, i))
            return carry * 1e-20 + jnp.sum(out["image"]) + out["rays"]
        return jax.lax.fori_loop(0, n_arr, body, jnp.zeros(()))

    float(frames(1))
    t1, _ = fetch_time(frames, 1)
    tn, _ = fetch_time(frames, 8)
    print(f"{'full whitted frame 512x512 1spp':46s} {(tn-t1)/7*1e3:9.2f} ms"
          f"   (t1={t1*1e3:7.1f} tn={tn*1e3:8.1f})", flush=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    main()
