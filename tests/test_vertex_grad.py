"""Vertex-position gradients incl. visibility terms (SURVEY.md §7 step 9,
BASELINE.md config #5): edge-sampled boundary gradients validated on a
one-triangle scene against (a) the analytic projected-area derivative and
(b) central differences of jitter-averaged renders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.builder import SceneBuilder
from mobileraytracer_tpu.cameras import CAMERA_PERSPECTIVE
from mobileraytracer_tpu.diff import (factors_of_point, scene_with_vertices,
                                      triangle_vertices, vertex_grad)
from mobileraytracer_tpu.renderer import render_frame
from mobileraytracer_tpu.types import RenderConfig, perspective_camera

KD = (0.6, 0.3, 0.9)
V0 = np.array([-0.4, -0.3, 0.0], np.float32)
V1 = np.array([0.5, -0.2, 0.0], np.float32)
V2 = np.array([0.0, 0.45, 0.0], np.float32)


def _one_tri_scene():
    b = SceneBuilder()
    b.add_triangle(V0, V1, V2, b.add_material(kd=KD))
    scene = jax.device_put(b.build())
    cam = perspective_camera((0, 0, -3.0), (0, 0, 1), (0, 1, 0), 45.0, 45.0)
    return scene, cam


@pytest.mark.slow
def test_boundary_gradient_matches_analytic_area_derivative():
    """DiffuseMaterial renders the triangle as flat kd over black, so
    loss = mean(kd) * (projected area in factor space); dL/dv must equal
    mean(kd) * dA/dv — carried entirely by the boundary term."""
    scene, cam = _one_tri_scene()
    cfg = RenderConfig(width=64, height=64, spp=1, shader=C.SHADER_DIFFUSE,
                       accelerator=C.ACC_NAIVE)
    loss, grads = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                              edge_samples=32, edge_eps=5e-4)

    c_mean = float(np.mean(KD))

    def weighted_area(verts_flat):
        """Quadrature of the pixel-density weight over the projected
        triangle: the exact expectation of mean(image)/mean(kd)."""
        from mobileraytracer_tpu.diff.geom import pixel_density
        v = verts_flat.reshape(3, 3)
        q = factors_of_point(cam, v)                    # (3, 2)
        n = 128
        i, j = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
        a = (i + 0.5) / n
        bb = (j + 0.5) / n
        inside = a + bb < 1.0
        pts = (q[0] + a[..., None] * (q[1] - q[0])
               + bb[..., None] * (q[2] - q[0]))
        dens = pixel_density(cam, pts)
        e1, e2 = q[1] - q[0], q[2] - q[0]
        par = jnp.abs(e1[0] * e2[1] - e1[1] * e2[0])
        return jnp.sum(jnp.where(inside, dens, 0.0)) * par / (n * n)

    flat = jnp.concatenate([jnp.asarray(V0), jnp.asarray(V1),
                            jnp.asarray(V2)])
    dA = np.asarray(jax.grad(weighted_area)(flat)).reshape(3, 3)
    expected = c_mean * dA

    got = np.stack([np.asarray(grads["va"])[0],
                    np.asarray(grads["vb"])[0],
                    np.asarray(grads["vc"])[0]])
    np.testing.assert_allclose(got, expected, rtol=0.03, atol=2e-4)


def test_edge_topology_culls_coplanar_interior():
    """A flat quad split into two coplanar same-material triangles: the
    shared diagonal is radiance-continuous and must be culled; the four
    outer (boundary) edges must keep."""
    from mobileraytracer_tpu.diff.geom import edge_topology
    b = SceneBuilder()
    m = b.add_material(kd=KD)
    p00, p10, p01, p11 = ([-1, -1, 0], [1, -1, 0], [-1, 1, 0], [1, 1, 0])
    b.add_triangle(p00, p10, p11, m)
    b.add_triangle(p00, p11, p01, m)
    scene = b.build()
    keep = edge_topology(scene.triangles)
    # Edge layout is [ab x N | bc x N | ca x N] over the (padded) capacity
    # N: the shared diagonal is tri0's ca edge (p11->p00, index 2N+0) and
    # tri1's ab edge (p00->p11, index 1).
    n = scene.triangles.point_a.shape[0]
    assert keep.shape == (3 * n,)
    assert not keep[2 * n + 0]
    assert not keep[1]
    assert keep.sum() == 4


def test_edge_budget_sampling_approximates_full_gradient():
    """The length-importance-sampled boundary estimator must agree with
    the full enumeration in expectation (single triangle: 3 edges, ample
    budget makes the MC error tiny)."""
    scene, cam = _one_tri_scene()
    cfg = RenderConfig(width=64, height=64, spp=1, shader=C.SHADER_DIFFUSE,
                       accelerator=C.ACC_NAIVE)
    from mobileraytracer_tpu.diff.geom import edge_topology
    keep = edge_topology(scene.triangles)
    assert keep.sum() == 3
    _, g_full = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                            edge_samples=16, edge_eps=5e-4, edge_keep=keep)

    @jax.jit
    def mc_once(key):
        _, g = vertex_grad(scene, cam, cfg, key, edge_samples=16,
                           edge_eps=5e-4, edge_keep=keep, edge_budget=12)
        return g["va"][0]

    gs = [np.asarray(mc_once(jax.random.PRNGKey(s))) for s in range(24)]
    mc = np.mean(gs, axis=0)
    full = np.asarray(g_full["va"])[0]
    np.testing.assert_allclose(mc, full, rtol=0.3, atol=1e-3)


@pytest.mark.slow
def test_vertex_gradient_sharded_matches_unsharded():
    """vertex_grad(mesh=...) shards the interior pixel batch and boundary
    probes over the virtual CPU mesh; gradients must match the unsharded
    evaluation (BASELINE #5's multi-chip probe layout)."""
    from mobileraytracer_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    scene, cam = _one_tri_scene()
    cfg = RenderConfig(width=64, height=64, spp=1, shader=C.SHADER_DIFFUSE,
                       accelerator=C.ACC_NAIVE)
    _, g1 = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                        edge_samples=16, edge_eps=5e-4)
    m = pmesh.make_mesh()
    _, g8 = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                        edge_samples=16, edge_eps=5e-4, mesh=m)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k])[0],
                                   np.asarray(g1[k])[0],
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_vertex_gradient_through_block_bvh_matches_naive():
    """The differentiable-render path of the BVH tracers (traversal under
    stop_gradient + live-table t recompute, ops/block_bvh.py) must give
    the same vertex gradients as the naive tracer."""
    from mobileraytracer_tpu.ops import block_bvh
    scene, cam = _one_tri_scene()
    cfg_n = RenderConfig(width=64, height=64, spp=1,
                         shader=C.SHADER_DIFFUSE, accelerator=C.ACC_NAIVE)
    _, g_n = vertex_grad(scene, cam, cfg_n, jax.random.PRNGKey(0),
                         edge_samples=32, edge_eps=5e-4)
    scene_b = block_bvh.build(scene)
    cfg_b = RenderConfig(width=64, height=64, spp=1,
                         shader=C.SHADER_DIFFUSE, accelerator=C.ACC_BVH)
    _, g_b = vertex_grad(scene_b, cam, cfg_b, jax.random.PRNGKey(0),
                         edge_samples=32, edge_eps=5e-4)
    for k in g_n:
        np.testing.assert_allclose(np.asarray(g_b[k])[0],
                                   np.asarray(g_n[k])[0],
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_shadow_boundary_gradient_matches_finite_differences():
    """VERDICT r3 item 4b: a blocker OUTSIDE the camera frustum casts a
    shadow INTO the view; moving its vertex changes the image only through
    the NEE visibility term, which the primary-only boundary machinery
    misses entirely (gradient would be ~0).  The shadow-edge boundary term
    must recover the finite-difference derivative of jitter-averaged
    renders."""
    b = SceneBuilder()
    floor_m = b.add_material(kd=(0.7, 0.7, 0.7))
    blk_m = b.add_material(kd=(0.2, 0.2, 0.2))
    # Floor quad at y=0, shading normals up (builder: cross(AC, AB); two
    # coplanar triangles whose diagonal gets culled).
    b.add_triangle([-3, 0, -3], [3, 0, -3], [3, 0, 3], floor_m)
    b.add_triangle([-3, 0, -3], [3, 0, 3], [-3, 0, 3], floor_m)
    # Blocker at y=1.5, x in [1.2, 2.2] — outside the narrow downward
    # view, between the oblique light and the floor.
    b.add_triangle([1.2, 1.5, -0.6], [2.2, 1.5, -0.3], [1.6, 1.5, 0.7],
                   blk_m)
    # Small area light up at (4, 5, 0).
    b.add_area_light([3.95, 5, -0.05], [4.05, 5, -0.05], [4.0, 5, 0.05],
                     radiance=(8.0, 8.0, 8.0))
    scene = jax.device_put(b.build())
    cam = perspective_camera((0, 3, 0), (0, -1, 0), (0, 0, 1), 40.0, 40.0)
    cfg = RenderConfig(width=64, height=64, spp=1, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)

    from mobileraytracer_tpu.diff.geom import edge_topology
    keep = edge_topology(scene.triangles)

    @jax.jit
    def ad_once(key):
        _, g = vertex_grad(scene, cam, cfg, key, edge_samples=16,
                           edge_eps=8e-4, edge_keep=keep,
                           shadow_edges=True, shadow_budget=64)
        return g["va"], g["vb"], g["vc"]

    gs = [ad_once(jax.random.PRNGKey(s)) for s in range(6)]
    # Blocker is triangle index 2; probe d loss / d v_a.x of the blocker.
    ad = float(np.mean([np.asarray(g[0])[2, 0] for g in gs]))

    verts = triangle_vertices(scene.triangles)
    cfg_fd = RenderConfig(width=64, height=64, spp=4,
                          shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE)

    @jax.jit
    def mean_img(dx, key):
        v2 = dict(verts)
        v2["va"] = v2["va"].at[2, 0].add(dx)
        s2 = scene_with_vertices(scene, v2)
        return jnp.mean(render_frame(s2, cam, cfg_fd, key)["image"])

    eps = 3e-2
    keys = [jax.random.PRNGKey(500 + i) for i in range(32)]
    hi = np.mean([float(mean_img(+eps, k)) for k in keys])
    lo = np.mean([float(mean_img(-eps, k)) for k in keys])
    fd = (hi - lo) / (2 * eps)
    assert abs(fd) > 1e-4, f"test scene degenerate: FD {fd}"
    assert abs(ad - fd) < max(0.2 * abs(fd), 1.5e-3), (ad, fd)


def test_vertex_gradient_matches_finite_differences():
    """Central differences of jitter-averaged renders (the image mean IS
    the area integral in expectation) vs the edge-sampled gradient."""
    scene, cam = _one_tri_scene()
    cfg = RenderConfig(width=64, height=64, spp=4, shader=C.SHADER_DIFFUSE,
                       accelerator=C.ACC_NAIVE)

    _, grads = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                           edge_samples=32, edge_eps=5e-4)
    ad = float(np.asarray(grads["va"])[0, 0])   # d loss / d v0.x

    verts = triangle_vertices(scene.triangles)

    @jax.jit
    def mean_img(dx, key):
        v2 = dict(verts)
        v2["va"] = v2["va"].at[0, 0].add(dx)
        s2 = scene_with_vertices(scene, v2)
        return jnp.mean(render_frame(s2, cam, cfg, key)["image"])

    eps = 2e-2
    keys = [jax.random.PRNGKey(100 + i) for i in range(48)]
    hi = np.mean([float(mean_img(+eps, k)) for k in keys])
    lo = np.mean([float(mean_img(-eps, k)) for k in keys])
    fd = (hi - lo) / (2 * eps)
    assert abs(ad - fd) < max(0.12 * abs(fd), 2e-3), (ad, fd)


@pytest.mark.slow
def test_vertex_gradient_sharded_1080p_shape():
    """BASELINE #5 scale on the 8-device CPU mesh: full vertex gradients
    at 1080p (1920x1072 after tile rounding) with the pixel-chunked
    interior (VERDICT r4 #5) sharded over the mesh.  Smoke-level oracle:
    finite gradients, a nonzero silhouette term, and the loss within the
    scene's known radiance range."""
    from mobileraytracer_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = jax.device_put(scene)
    cfg = RenderConfig(width=1920, height=1080, spp=1,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE,
                       scene_id=C.SCENE_CORNELL2).rounded()
    assert (cfg.width, cfg.height) == (1920, 1072)
    m = pmesh.make_mesh()
    loss, g = vertex_grad(scene, cam, cfg, jax.random.PRNGKey(0),
                          edge_samples=4, mesh=m,
                          pixel_chunk=cfg.width * cfg.height // 4)
    assert np.isfinite(float(loss)) and 0.05 < float(loss) < 2.0
    for k in ("va", "vb", "vc"):
        arr = np.asarray(g[k])
        assert np.isfinite(arr).all()
    # The green triangle's silhouette must contribute.
    assert float(np.abs(np.asarray(g["va"])[1]).max()) > 1e-4
