"""Multi-device sharding tests on the 8-way virtual CPU mesh — the
"instrumented" tier of SURVEY.md §4: fake the mesh, not the math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.parallel import mesh as pmesh
from mobileraytracer_tpu.renderer import render_frame
from mobileraytracer_tpu.types import RenderConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) platform")


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    """Sharding is a pure execution detail: the counter-based RNG keys every
    sampling decision by (pixel, sample, lane-pop), so the N-device render
    draws the *same estimator decisions* as the 1-device one — checked
    exactly via the casted-ray count.  Radiance agrees to float rounding:
    the wavefront-compacted walk (shaders/engine.py) fuses differently at
    different batch sizes, so XLA's FMA contraction may round the last few
    ulps differently across layouts."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=32, height=32, spp=2, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)
    key = jax.random.PRNGKey(0)
    ref = render_frame(scene, cam, cfg, key)
    m = pmesh.make_mesh()
    out = pmesh.render_frame_sharded(scene, cam, cfg, key, m)
    np.testing.assert_allclose(np.asarray(ref["image"]),
                               np.asarray(out["image"]), atol=5e-5)
    assert int(ref["rays"]) == int(out["rays"])


def test_sharded_bvh_render_bit_identical():
    """The sharded frame must be BIT-identical to the unsharded one on the
    block-BVH path: shards receive contiguous patch-major lane ranges, so
    every traversal tile sees the same 128-ray bundle sharded or not
    (VERDICT r3: row-major sharding destroyed the coherent order)."""
    from mobileraytracer_tpu.ops import block_bvh
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = block_bvh.build(scene)
    cfg = RenderConfig(width=32, height=32, spp=2, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_BVH)
    key = jax.random.PRNGKey(0)
    ref = render_frame(scene, cam, cfg, key)
    m = pmesh.make_mesh()
    out = pmesh.render_frame_sharded(scene, cam, cfg, key, m)
    np.testing.assert_array_equal(np.asarray(ref["bitmap"]),
                                  np.asarray(out["bitmap"]))
    assert int(ref["rays"]) == int(out["rays"])


def test_sharded_int_parity_accumulation():
    """int_parity accumulation (the reference's int-packed incremental
    average) through the sharded path: bitwise equal to the unsharded
    int-parity frame."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=32, height=32, spp=3, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE, accumulation="int_parity")
    key = jax.random.PRNGKey(0)
    ref = render_frame(scene, cam, cfg, key)
    m = pmesh.make_mesh()
    out = pmesh.render_frame_sharded(scene, cam, cfg, key, m)
    np.testing.assert_array_equal(np.asarray(ref["bitmap"]),
                                  np.asarray(out["bitmap"]))


def test_sharded_render_subset_mesh():
    scene, cam = scenes.load_builtin(C.SCENE_SPHERES2, 1.0)
    cfg = RenderConfig(width=32, height=32, spp=1, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)
    m = pmesh.make_mesh(n_devices=2)
    out = pmesh.render_frame_sharded(scene, cam, cfg, jax.random.PRNGKey(0), m)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all() and img.max() > 0


@pytest.mark.slow
def test_train_step_gradients_flow_and_reduce():
    """Differentiable albedo/emission: gradients must be finite, nonzero for
    used materials, and identical across mesh sizes."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=16, height=16, spp=1, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((16, 16, 3), jnp.float32)

    m8 = pmesh.make_mesh()
    loss8, g8 = pmesh.train_step_sharded(scene, cam, cfg, key, target, m8)
    m1 = pmesh.make_mesh(n_devices=1)
    loss1, g1 = pmesh.train_step_sharded(scene, cam, cfg, key, target, m1)

    assert np.isfinite(float(loss8)) and float(loss8) > 0
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    kd8, kd1 = np.asarray(g8["kd"]), np.asarray(g1["kd"])
    np.testing.assert_allclose(kd8, kd1, rtol=1e-4, atol=1e-7)
    assert np.abs(kd8).max() > 0


@pytest.mark.slow
def test_gradient_matches_finite_differences():
    """Albedo gradient sanity vs central differences of the renderer."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=16, height=16, spp=1, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    m = pmesh.make_mesh(n_devices=1)
    _, grads = pmesh.train_step_sharded(scene, cam, cfg, key, target, m)

    # Perturb the yellow triangle's red albedo channel (material 0).
    eps = 1e-3
    mat_idx, ch = 0, 0

    def loss_at(delta):
        kd = jnp.asarray(scene.materials.kd).at[mat_idx, ch].add(delta)
        s2 = scene.replace(materials=scene.materials.replace(kd=kd))
        img = render_frame(s2, cam, cfg, key)["image"]
        return float(jnp.mean((img.reshape(-1, 3) - target.reshape(-1, 3)) ** 2))

    # Both normalize by W*H*3 (train_step divides the SSE; loss_at uses the
    # elementwise mean), so the values are directly comparable.
    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    ad = float(np.asarray(grads["kd"])[mat_idx, ch])
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=1e-6)
