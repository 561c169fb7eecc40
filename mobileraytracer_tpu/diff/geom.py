"""Vertex-position gradients with visibility (edge-sampling) terms.

The image is discontinuous in vertex positions at silhouette edges, so
plain reverse-mode through the renderer only yields the *interior* term
(shading/geometry at fixed visibility).  The missing *boundary* term is
the classic edge-sampling integral (Li et al. 2018, "Differentiable Monte
Carlo Ray Tracing through Edge Sampling" — public technique, re-derived
here for this camera model): for a loss L = mean(image),

    dL/dv = interior (AD, fixed hit topology)
          + sum_edges INT_0^1 [L_in(s) - L_out(s)] (n_hat . dq(x(s))/dv)
                              |q1 - q0| ds

where q(x) maps a world point to the camera's *factor space* — the
(right, up)-plane coordinates that `cameras.generate_rays` perturbs with
the pixel jitter (reference Renderer.cpp:137-140), so the pixel-box filter
is exactly a box in q and the mean image is (up to pixel-tiling warp) the
area integral the boundary term differentiates.  The edge is a straight
segment in q (perspective maps lines to lines), n_hat its outward 2-D
normal, and L_in/L_out are radiances traced just inside/outside — which
makes partial occlusion of the edge by other geometry handled for free
(occluded stretches have L_in == L_out).

TPU shape: all edges x samples evaluated as one flat ray batch through the
standard wavefront tracer; the projection Jacobians are a vmapped 3x3
solve + jacrev, entirely on the VPU.  No reference counterpart exists
(the C++ engine is forward-only); cited files are for the camera/jitter
contracts only.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..shaders.engine import trace_image_sample
from ..types import Camera, RenderConfig, Scene, Triangles
from ..types import CAMERA_PERSPECTIVE


def factors_of_point(camera: Camera, x: jnp.ndarray) -> jnp.ndarray:
    """Maps world points (..., 3) to camera factor coordinates (..., 2):
    the (right, up) plane offsets that generate_rays turns into rays.
    Perspective: solve s(x - p) = direction + rf*right + uf*up.
    Orthographic: solve x - p = rf*right + uf*up + s*direction."""
    p = camera.position
    w = x - p

    def solve_one(wv):
        a_persp = jnp.stack([wv, -camera.right, -camera.up], axis=1)
        sol_p = jnp.linalg.solve(a_persp, camera.direction)
        a_orth = jnp.stack([camera.right, camera.up, camera.direction],
                           axis=1)
        sol_o = jnp.linalg.solve(a_orth, wv)
        persp = camera.kind == CAMERA_PERSPECTIVE
        rf = jnp.where(persp, sol_p[1], sol_o[0])
        uf = jnp.where(persp, sol_p[2], sol_o[1])
        return jnp.stack([rf, uf])

    flat = w.reshape(-1, 3)
    q = jax.vmap(solve_one)(flat)
    return q.reshape(x.shape[:-1] + (2,))


def rays_from_factors(camera: Camera, q: jnp.ndarray):
    """Rays through factor coordinates q (..., 2) — the jitterless core of
    cameras.generate_rays with (rf, uf) given directly."""
    rf, uf = q[..., 0], q[..., 1]
    dest = (camera.position + camera.direction
            + camera.right * rf[..., None] + camera.up * uf[..., None])
    dir_p = dest - camera.position
    dir_p = dir_p / jnp.linalg.norm(dir_p, axis=-1, keepdims=True)
    org_p = jnp.broadcast_to(camera.position, dir_p.shape)
    org_o = (camera.position + camera.right * rf[..., None]
             + camera.up * uf[..., None])
    dir_o = jnp.broadcast_to(camera.direction, org_o.shape)
    persp = camera.kind == CAMERA_PERSPECTIVE
    return (jnp.where(persp, org_p, org_o),
            jnp.where(persp, dir_p, dir_o))


def pixel_density(camera: Camera, q: jnp.ndarray) -> jnp.ndarray:
    """Pixels per unit factor-space area, normalized by the pixel count:
    the weight that turns the factor-space area integral into the actual
    pixel-mean image (see vertex_grad)."""
    rf, uf = q[..., 0], q[..., 1]
    persp = (1.0 + jnp.tan(rf) ** 2) * (1.0 + jnp.tan(uf) ** 2)
    dens = jnp.where(camera.kind == CAMERA_PERSPECTIVE, persp, 1.0)
    return dens / (camera.param_u * camera.param_v)


def triangle_vertices(tris: Triangles) -> Dict[str, jnp.ndarray]:
    """The vertex parameterization: va/vb/vc (N, 3) world positions."""
    va = jnp.asarray(tris.point_a)
    return {"va": va, "vb": va + jnp.asarray(tris.ab),
            "vc": va + jnp.asarray(tris.ac)}


def scene_with_vertices(scene: Scene, verts: Dict[str, jnp.ndarray]) -> Scene:
    """Rebuilds the triangle table (and geometric shading normals) from
    vertex positions — every derived quantity stays differentiable."""
    va, vb, vc = verts["va"], verts["vb"], verts["vc"]
    ab = vb - va
    ac = vc - va
    gn = jnp.cross(ab, ac)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    tris = scene.triangles.replace(point_a=va, ab=ab, ac=ac,
                                   normal_a=gn, normal_b=gn, normal_c=gn)
    return scene.replace(triangles=tris)


def _mean_radiance(scene: Scene, camera: Camera, config: RenderConfig,
                   q: jnp.ndarray, keys) -> jnp.ndarray:
    """Mean radiance of rays through factor points q (B, 2)."""
    o, d = rays_from_factors(camera, q)
    rgb, _ = trace_image_sample(scene, config, o, d, keys,
                                differentiable=True)
    return rgb


def edge_topology(tris: Triangles, quantum: float = 1e-5) -> "np.ndarray":
    """Host-side static edge culling (numpy, concrete arrays only): a
    directed edge of the triangle soup can carry a boundary term only if
    the image can actually jump across it.  A shared edge whose two faces
    are coplanar with identical shading normals and the same material is
    radiance-continuous (the tessellation diagonals of flat walls — the
    bulk of a scene like conference), so both copies drop; boundary
    (unshared) edges, creases, and material seams keep.  Returns a (3N,)
    bool keep mask over the [ab | bc | ca] edge slots that vertex_grad
    enumerates.

    This is the static part of silhouette culling: view-dependent
    silhouette tests do not apply to two-sided surfaces (every face is
    hittable from both sides, ops/intersect.py's two-sided MT), so only
    provably-zero jumps are dropped — the estimator stays exact."""
    import numpy as np

    va = np.asarray(tris.point_a)
    vb = va + np.asarray(tris.ab)
    vc = va + np.asarray(tris.ac)
    n = va.shape[0]
    valid = np.asarray(tris.valid)
    nrm = np.cross(np.asarray(tris.ab), np.asarray(tris.ac))
    ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.maximum(ln, 1e-30)
    mat = np.asarray(tris.mat_id)

    def key_of(p):
        return np.round(p / quantum).astype(np.int64)

    ka, kb, kc = key_of(va), key_of(vb), key_of(vc)
    # Undirected edge keys: sorted endpoint tuples.
    e_ends = [(ka, kb), (kb, kc), (kc, ka)]
    keys = []
    for (p, q) in e_ends:
        lo = np.minimum(p, q)
        hi = np.maximum(p, q)
        keys.append(np.concatenate([lo, hi], axis=1))
    allk = np.concatenate(keys, axis=0)                  # (3N, 6)
    order = np.lexsort(allk.T)
    sk = allk[order]
    same_prev = np.concatenate([[False],
                                np.all(sk[1:] == sk[:-1], axis=1)])
    same_next = np.concatenate([same_prev[1:], [False]])
    # Mate lookup (adjacent in sort order; runs > 2 — non-manifold —
    # still pair up arbitrarily, which only makes the cull weaker).
    mate_sorted = np.full(3 * n, -1, np.int64)
    prev_idx = np.nonzero(same_prev)[0]
    mate_sorted[prev_idx] = order[prev_idx - 1]
    next_idx = np.nonzero(same_next)[0]
    mate_sorted[next_idx] = order[next_idx + 1]
    mate = np.full(3 * n, -1, np.int64)
    mate[order] = mate_sorted

    tri_of = np.tile(np.arange(n), 3)
    keep = np.ones(3 * n, bool)
    has_mate = mate >= 0
    m_tri = tri_of[np.maximum(mate, 0)]
    coplanar = np.abs(np.einsum("ij,ij->i", nrm[tri_of],
                                nrm[m_tri])) > 1.0 - 1e-6
    same_nrm = np.linalg.norm(nrm[tri_of] - nrm[m_tri], axis=-1) < 1e-6
    same_mat = mat[tri_of] == mat[m_tri]
    drop = has_mate & coplanar & same_nrm & same_mat
    keep &= ~drop
    # Edge arrays are slot-major ([ab x N | bc x N | ca x N]): tile, not
    # repeat.
    keep &= np.tile(valid, 3)
    # Degenerate faces contribute nothing.
    keep &= np.tile(ln[:, 0] > 1e-20, 3)
    return keep


def vertex_grad(scene: Scene, camera: Camera, config: RenderConfig,
                base_key: jax.Array, edge_samples: int = 8,
                edge_eps: float = 1e-3,
                spp: int = 1, edge_keep=None,
                edge_budget: int = None
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Gradient of L = mean(image) w.r.t. every triangle vertex.

    Returns (loss, {"va": (N,3), "vb": ..., "vc": ...}).  interior term:
    reverse-mode through `spp` jitterless samples at fixed visibility;
    boundary term: `edge_samples` points per triangle edge, two-sided
    radiance probes offset `edge_eps` in factor space.

    `edge_keep`: optional (3N,) bool mask from `edge_topology` zeroing
    provably-continuous edges.  `edge_budget`: if set, the boundary term
    is a length-importance-sampled Monte-Carlo estimate over `edge_budget`
    kept edges instead of the full 3N enumeration — O(budget) probe rays
    (the silhouette-scaling mode for large scenes; unbiased, each sampled
    edge weighted by 1/(budget * p_edge)).
    """
    from .. import sampling
    from ..renderer import _pixel_order

    w, h = config.width, config.height
    verts = triangle_vertices(scene.triangles)
    u, v, pids, _ = _pixel_order(config)
    keys = sampling.ray_key(base_key, pids, 0)

    # ---- interior: AD at fixed visibility through the standard tracer ---
    from ..cameras import fast_arctan

    def interior_loss(vt):
        s2 = scene_with_vertices(scene, vt)
        qs = jnp.stack([fast_arctan(camera.param_u * (u - 0.5)),
                        fast_arctan(camera.param_v * (0.5 - v))], axis=-1)
        rgb = _mean_radiance(s2, camera, config, qs, keys)
        return jnp.mean(rgb)

    loss, g_int = jax.value_and_grad(interior_loss)(verts)

    # ---- boundary: edge sampling in factor space ------------------------
    n_tri = verts["va"].shape[0]
    sa = (jnp.arange(edge_samples, dtype=jnp.float32) + 0.5) / edge_samples

    va, vb, vc = verts["va"], verts["vb"], verts["vc"]
    # Edge list: (E, 2, 3) endpoints and the opposite vertex (for the
    # inward direction); E = 3 * n_tri in slot order [ab | bc | ca].
    e0 = jnp.concatenate([va, vb, vc], 0)
    e1 = jnp.concatenate([vb, vc, va], 0)
    opp = jnp.concatenate([vc, va, vb], 0)

    q0 = factors_of_point(camera, e0)                    # (E, 2)
    q1 = factors_of_point(camera, e1)
    qo = factors_of_point(camera, opp)
    seg = q1 - q0
    seg_len = jnp.linalg.norm(seg, axis=-1)              # (E,)
    n_hat = jnp.stack([seg[:, 1], -seg[:, 0]], -1)
    n_hat = n_hat / jnp.maximum(seg_len[:, None], 1e-20)
    # Orient outward: flip if the opposite vertex lies on the +n side.
    inward = jnp.sum((qo - q0) * n_hat, -1)
    n_hat = jnp.where((inward > 0)[:, None], -n_hat, n_hat)

    w_e = seg_len
    if edge_keep is not None:
        w_e = w_e * jnp.asarray(edge_keep, jnp.float32)

    if edge_budget is None:
        # Full enumeration: every kept edge integrated with S samples.
        sel = jnp.arange(e0.shape[0], dtype=jnp.int32)
        mc_w = jnp.where(w_e > 0, 1.0, 0.0)
    else:
        # Length-importance-sampled edge subset: O(budget) probes
        # regardless of scene size (the silhouette-scaling mode).  Each
        # sampled edge is weighted by 1/(budget * p_e); edges with zero
        # weight are never drawn.
        bkey = jax.random.fold_in(base_key, 0x5ed6e)
        total_w = jnp.sum(w_e)
        logits = jnp.log(jnp.maximum(w_e, 1e-30))
        sel = jax.random.categorical(bkey, logits, shape=(edge_budget,))
        p_e = w_e[sel] / jnp.maximum(total_w, 1e-30)
        mc_w = jnp.where(p_e > 0, 1.0 / (edge_budget * p_e), 0.0)

    e0s, e1s = e0[sel], e1[sel]
    segs, lens, nhs = seg[sel], seg_len[sel], n_hat[sel]
    q0s = q0[sel]

    # Edge sample points in factor space: (Es, S, 2).
    qs = q0s[:, None, :] + segs[:, None, :] * sa[None, :, None]
    probe_in = (qs - edge_eps * nhs[:, None, :]).reshape(-1, 2)
    probe_out = (qs + edge_eps * nhs[:, None, :]).reshape(-1, 2)

    e_total = probe_in.shape[0]
    pkeys = sampling.ray_key(base_key, jnp.arange(e_total, dtype=jnp.int32),
                             1)
    l_in = _mean_radiance(scene, camera, config, probe_in, pkeys)
    l_out = _mean_radiance(scene, camera, config, probe_out, pkeys)
    dl = jnp.mean(l_in - l_out, axis=-1).reshape(-1, edge_samples)

    # Pixel-density weight: the jitter box has width 1/w x 1/h in factor
    # space but pixel centers are arctan-warped (Renderer.cpp:137-140 adds
    # the deviation AFTER fastArcTan), so the image mean is the
    # density-weighted integral  mean = INT L(q) rho(q) dq  with
    # rho = (1+tan^2 rf)(1+tan^2 uf)/(pu pv)  (perspective) or
    # 1/(pu pv) (orthographic).
    dl = dl * pixel_density(camera, qs)

    # dq/dv at each sample: x(s) = (1-s) p0 + s p1, so dq/dv0 = (1-s) J(x)
    # and dq/dv1 = s J(x) with J = d factors / d world point (2x3).
    xs = (e0s[:, None, :] * (1 - sa)[None, :, None]
          + e1s[:, None, :] * sa[None, :, None]).reshape(-1, 3)
    jac = jax.vmap(jax.jacrev(
        lambda p: factors_of_point(camera, p)))(xs)       # (Es*S, 2, 3)
    ndotj = jnp.einsum("ek,ekd->ed",
                       jnp.repeat(nhs, edge_samples, 0), jac)  # (Es*S, 3)
    ndotj = ndotj.reshape(-1, edge_samples, 3)

    wgt = dl * (lens * mc_w)[:, None] / edge_samples      # (Es, S)
    g0 = jnp.sum(wgt[:, :, None] * ndotj * (1 - sa)[None, :, None], axis=1)
    g1 = jnp.sum(wgt[:, :, None] * ndotj * sa[None, :, None], axis=1)

    # Scatter per-edge endpoint gradients back to the vertex slots: edge
    # id e has slot e // n_tri (0 ab, 1 bc, 2 ca) and triangle e % n_tri;
    # endpoint 0 of slot 0/1/2 is va/vb/vc, endpoint 1 is vb/vc/va.
    slot = sel // n_tri
    tri = sel % n_tri
    zeros = jnp.zeros((n_tri, 3), jnp.float32)
    g_bnd = {"va": zeros, "vb": zeros, "vc": zeros}
    names = ["va", "vb", "vc"]
    for sl in range(3):
        msk = (slot == sl)[:, None]
        p0, p1 = names[sl], names[(sl + 1) % 3]
        g_bnd[p0] = g_bnd[p0].at[tri].add(jnp.where(msk, g0, 0.0))
        g_bnd[p1] = g_bnd[p1].at[tri].add(jnp.where(msk, g1, 0.0))

    grads = {k: g_int[k] + g_bnd[k] for k in g_int}
    return loss, grads
