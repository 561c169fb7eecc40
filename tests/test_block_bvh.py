"""Two-level tile-cooperative block traversal: parity with the naive
oracle (the production ACC_BVH path on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.builder import SceneBuilder
from mobileraytracer_tpu.ops import block_bvh
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


def test_block_matches_naive_random_scene():
    rng = np.random.default_rng(0)
    b = SceneBuilder()
    m = b.add_material(kd=(0.8, 0.7, 0.6))
    centers = rng.uniform(-5, 5, size=(900, 3)).astype(np.float32)
    e1 = rng.normal(size=(900, 3)).astype(np.float32) * 0.4
    e2 = rng.normal(size=(900, 3)).astype(np.float32) * 0.4
    for i in range(900):
        b.add_triangle(centers[i], centers[i] + e1[i], centers[i] + e2[i], m)
    scene = block_bvh.build(b.build())
    o, d = _random_rays(512, -8, 8)
    hit_n = nv.intersect_scene_naive(scene, o, d, *_no_prev(512))
    hit_b = block_bvh.intersect_scene_blocks(scene, o, d, *_no_prev(512))
    np.testing.assert_allclose(np.asarray(hit_n.t), np.asarray(hit_b.t),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit_n.prim_id),
                                  np.asarray(hit_b.prim_id))


def test_block_matches_naive_cornell_water():
    from mobileraytracer_tpu.loaders.obj import load_obj_scene_ex
    base = ("/root/reference/app/src/androidTest/resources/CornellBox/"
            "CornellBox-Water")
    scene, _ = load_obj_scene_ex(base + ".obj")
    scene = block_bvh.build(scene)
    o, d = _random_rays(512, -1.5, 1.5, seed=3)
    hit_n = nv.intersect_scene_naive(scene, o, d, *_no_prev(512))
    hit_b = block_bvh.intersect_scene_blocks(scene, o, d, *_no_prev(512))
    np.testing.assert_allclose(np.asarray(hit_n.t), np.asarray(hit_b.t),
                               rtol=1e-5)


def test_block_shadow_matches_naive():
    from mobileraytracer_tpu.loaders.obj import load_obj_scene_ex
    base = ("/root/reference/app/src/androidTest/resources/CornellBox/"
            "CornellBox-Water")
    scene, _ = load_obj_scene_ex(base + ".obj")
    scene = block_bvh.build(scene)
    o, d = _random_rays(512, -1.5, 1.5, seed=5)
    dist = jnp.full((512,), 2.0)
    bn = nv.occluded_naive(scene, o, d, dist, *_no_prev(512))
    bb_ = block_bvh.occluded_blocks(scene, o, d, dist, *_no_prev(512))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(bb_))


@pytest.mark.slow
def test_block_render_matches_naive_render():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    key = jax.random.PRNGKey(0)
    scene_b = block_bvh.build(scene)
    img_n = np.asarray(render_frame(
        scene_b, cam, RenderConfig(width=32, height=32, spp=1,
                                   shader=C.SHADER_WHITTED,
                                   accelerator=C.ACC_NAIVE), key)["image"])
    img_b = np.asarray(render_frame(
        scene_b, cam, RenderConfig(width=32, height=32, spp=1,
                                   shader=C.SHADER_WHITTED,
                                   accelerator=C.ACC_BVH), key)["image"])
    np.testing.assert_allclose(img_n, img_b, atol=1e-6)


def test_block_nondivisible_batch():
    """Ray batches not divisible by the tile size are padded internally."""
    scene, _ = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = block_bvh.build(scene)
    o, d = _random_rays(37, -1, 1, seed=7)
    hit = block_bvh.intersect_scene_blocks(scene, o, d, *_no_prev(37))
    assert hit.t.shape == (37,)
    assert np.isfinite(np.asarray(hit.t)).all()
