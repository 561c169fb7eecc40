"""Regular-grid accelerator: DDA parity with the naive oracle (the
reference's AcceleratorTestEngine matrix covers Naive/RegGrid/BVH)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.builder import SceneBuilder
from mobileraytracer_tpu.ops import grid as grid_ops
from mobileraytracer_tpu.ops import intersect as nv
from mobileraytracer_tpu.renderer import render_frame
from mobileraytracer_tpu.types import RenderConfig


def _no_prev(n):
    return jnp.zeros((n,), jnp.int32), jnp.full((n,), -1, jnp.int32)


def _random_rays(nr, lo, hi, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, size=(nr, 3)).astype(np.float32)
    d = rng.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_grid_matches_naive_mixed_scene():
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    m = b.add_material(kd=(0.8, 0.7, 0.6))
    for i in range(150):
        c = rng.uniform(-5, 5, 3).astype(np.float32)
        b.add_triangle(c, c + rng.normal(size=3) * 0.5,
                       c + rng.normal(size=3) * 0.5, m)
    for i in range(20):
        b.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.2, 0.8), m)
    scene = grid_ops.build_grid(b.build(), size=16)
    o, d = _random_rays(256, -7, 7)
    hit_n = nv.intersect_scene_naive(scene, o, d, *_no_prev(256))
    hit_g = grid_ops.intersect_scene_grid(scene, o, d, *_no_prev(256))
    np.testing.assert_allclose(np.asarray(hit_n.t), np.asarray(hit_g.t),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit_n.prim_kind),
                                  np.asarray(hit_g.prim_kind))


def test_grid_shadow_matches_naive():
    rng = np.random.default_rng(2)
    b = SceneBuilder()
    m = b.add_material(kd=(1, 1, 1))
    for i in range(100):
        c = rng.uniform(-3, 3, 3).astype(np.float32)
        b.add_triangle(c, c + rng.normal(size=3) * 0.4,
                       c + rng.normal(size=3) * 0.4, m)
    scene = grid_ops.build_grid(b.build(), size=8)
    o, d = _random_rays(128, -4, 4, seed=3)
    dist = jnp.full((128,), 3.0)
    bn = nv.occluded_naive(scene, o, d, dist, *_no_prev(128))
    bg = grid_ops.occluded_grid(scene, o, d, dist, *_no_prev(128))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(bg))


@pytest.mark.slow
def test_grid_render_matches_naive_render():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    key = jax.random.PRNGKey(0)
    scene_g = grid_ops.build_grid(scene)
    img_n = np.asarray(render_frame(
        scene_g, cam, RenderConfig(width=32, height=32, spp=1,
                                   shader=C.SHADER_WHITTED,
                                   accelerator=C.ACC_NAIVE), key)["image"])
    img_g = np.asarray(render_frame(
        scene_g, cam, RenderConfig(width=32, height=32, spp=1,
                                   shader=C.SHADER_WHITTED,
                                   accelerator=C.ACC_REGULAR_GRID),
        key)["image"])
    np.testing.assert_allclose(img_n, img_g, atol=1e-6)


def test_grid_empty_cells_and_outside_rays():
    b = SceneBuilder()
    m = b.add_material(kd=(1, 1, 1))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = grid_ops.build_grid(b.build(), size=4)
    # Ray starting far outside the grid toward it, and one missing it.
    o = jnp.asarray([[0, 0, -50], [0, 30, -50]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    hit = grid_ops.intersect_scene_grid(scene, o, d, *_no_prev(2))
    assert hit.prim_kind[0] == C.PRIM_SPHERE
    np.testing.assert_allclose(float(hit.t[0]), 49.0, rtol=1e-5)
    assert hit.prim_kind[1] == C.PRIM_NONE
