#!/usr/bin/env python
"""The honest TPU frame profiler for the conference Whitted workload.

Measurement rules for the tunneled "axon" backend (learned the hard way,
see PERF.md "Measuring on axon"):
  1. `block_until_ready` does NOT wait for device completion — only a
     value fetch (float()/np.asarray) truly syncs.
  2. A value fetch pays 0.1-0.4 s of relay latency, so phases are
     repeated N times inside ONE executable (fori_loop) with exactly one
     scalar fetched; phase time = (T(N) - T(1)) / (N - 1).
  3. The relay serves *bitwise-identical* dispatches from a replay cache:
     every iteration must perturb its inputs MEANINGFULLY (a +1e-12 that
     rounds away reproduces the same bits and measures the cache, ~2-4x
     too fast).  Keys fold the loop index; ray origins shift by visible
     amounts.

Run: PYTHONPATH=/root/repo:/root/repo/scripts:/root/.axon_site \
     python scripts/profile.py
"""
import pickle
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def cached_conference(lanes=128):
    """Conference proxy with the Pallas block build cached on disk (the
    SAH+packing build is ~1 min of host work)."""
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.ops import pallas_bvh

    scene, cam, info = conference_proxy()
    path = f"/root/repo/.cache/conf_lanes{lanes}_v7.pkl"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        tris2 = jax.tree.map(jnp.asarray, blob["tris"])
        grid = pallas_bvh.PallasGrid(
            **{k: jnp.asarray(v) for k, v in blob["grid"].items()},
            top_s=blob["top_s"], top_m=blob["top_m"],
            t_margin=blob["t_margin"])
        scene = scene.replace(triangles=tris2, bvh=grid)
    else:
        scene = pallas_bvh.build(scene, lanes=lanes)
        g = scene.bvh
        blob = {
            "tris": jax.tree.map(np.asarray, scene.triangles),
            "grid": {k: np.asarray(getattr(g, k)) for k in
                     ("super_lo", "super_hi", "blocks_packed",
                      "tb", "tw",
                      "tri_attr")},
            "top_s": g.top_s, "top_m": g.top_m, "t_margin": g.t_margin,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
    return jax.device_put(scene), cam, info


def main():
    from mobileraytracer_tpu import constants as C, sampling
    from mobileraytracer_tpu.cameras import generate_rays
    from mobileraytracer_tpu.ops import pallas_bvh as pb
    from mobileraytracer_tpu.renderer import _pixel_order, render_frame
    from mobileraytracer_tpu.shaders import common, engine
    from mobileraytracer_tpu.types import RenderConfig

    t0 = time.perf_counter()
    scene, cam, info = cached_conference()
    grid = scene.bvh
    print(f"setup {time.perf_counter()-t0:.1f}s: supers={grid.num_supers} "
          f"blocks={grid.tb.shape[0]} top_s={grid.top_s} "
          f"top_m={grid.top_m}", flush=True)

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

    # Measured phase rows append to a JSONL so per-round regressions are
    # visible without hand-transcribing into PERF.md (VERDICT r4 weak #7).
    import datetime
    import json
    log_path = "/root/repo/PERF_PHASES.jsonl"

    def prof(label, body, n=8):
        @jax.jit
        def run(n_arr):
            def f(i, carry):
                return carry * 1e-20 + body(jax.random.fold_in(key, i), i)
            return jax.lax.fori_loop(0, n_arr, f, jnp.zeros(()))
        float(run(1))
        t1 = fetch_time(run, 1)
        tn = fetch_time(run, n)
        ms = (tn - t1) / (n - 1) * 1e3
        print(f"{label:48s} {ms:9.2f} ms", flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps({
                "ts": datetime.datetime.now().isoformat(timespec="seconds"),
                "phase": label, "ms": round(ms, 2),
                "workload": "conference 512x512 whitted 1spp",
            }) + "\n")

    # Primary rays shifted a visible amount per iteration (rule 3).
    def vary_o(i):
        return o + d * (0.003 * i.astype(jnp.float32))

    def cand_body(k, i):
        cg, cf, ce, cut = pb._candidates(grid, vary_o(i), d)
        return jnp.sum(ce)

    prof("candidates window 1 (XLA)", cand_body)

    def closest_body(k, i):
        t, idx = pb.traverse(grid, scene.triangles, vary_o(i), d,
                             C.RAY_LENGTH_MAX, pk, pi)
        return jnp.sum(t)

    prof("traverse closest banded (cand+kernel+refill)", closest_body)

    def closest_tile_body(k, i):
        t, idx = pb.traverse_tilemt(grid, scene.triangles, vary_o(i), d,
                                    C.RAY_LENGTH_MAX, pk, pi)
        return jnp.sum(t)

    prof("traverse closest tile-MT (production)", closest_tile_body)

    def scene_closest(k, i):
        h = tracer.closest(scene, vary_o(i), d, pk, pi)
        return jnp.sum(h.t)

    prof("scene closest (+planes/spheres/fill)", scene_closest)

    def nee_body(k, i):
        kk = sampling.ray_key(k, pids, 0)
        hit = tracer.closest(scene, vary_o(i), d, pk, pi, coherent=True)
        nee_keys = sampling.event_key(kk, jnp.zeros((b,), jnp.int32), 1)
        diffuse = ~hit.missed
        # Production first-bounce path: downsampled sampling, reversed
        # shared-light segments, shadow-tuned selection windows.
        ld, ns = common.direct_lighting(
            scene, hit, nee_keys, cfg.samples_light, shadows=True,
            occluded_fn=tracer.occluded, mask=diffuse,
            share_mask=None, share_width=cfg.nee_share,
            share_all=True, reverse=True, coherent=True)
        return jnp.sum(ld)

    prof("closest + NEE (sampling+shadow any-hit)", nee_body)

    def walker_body(k, i):
        kk = sampling.ray_key(k, pids, 0)
        rgb, rays = engine.trace_radiance(scene, cfg, tracer, vary_o(i), d,
                                          kk)
        return jnp.sum(rgb)

    prof("trace_radiance (walker, all bounces)", walker_body)

    def frame_body(k, i):
        out = render_frame(scene, cam, cfg, k)
        return jnp.sum(out["image"]) + out["rays"]

    prof("full whitted frame 512x512 1spp", frame_body)


if __name__ == "__main__":
    main()
