"""Engine tests: full small renders through the public API, one per shader
and per scene — the analogue of the reference's system tier (reference
app/Unit_Testing/engine/ShaderTestEngine.cpp:35-123,
AcceleratorTestEngine.cpp:34-84; oracle = bitmap is not uniform)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import film, scenes
from mobileraytracer_tpu.renderer import Renderer, render_frame
from mobileraytracer_tpu.types import RenderConfig

SIZE = 32


def _render(scene_id, shader, spp=1, accelerator=C.ACC_NAIVE, spl=1):
    scene, cam = scenes.load_builtin(scene_id, 1.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=spp, shader=shader,
                       accelerator=accelerator, samples_light=spl,
                       scene_id=scene_id)
    out = render_frame(scene, cam, cfg, jax.random.PRNGKey(0),
                       max_point=jnp.asarray(scenes.DEPTHMAP_MAX_POINT[scene_id]))
    return out


@pytest.mark.parametrize("shader", [C.SHADER_NOSHADOWS, C.SHADER_WHITTED,
                                    C.SHADER_PATHTRACER, C.SHADER_DEPTHMAP,
                                    C.SHADER_DIFFUSE])
def test_every_shader_renders_nonuniform_cornell(shader):
    out = _render(C.SCENE_CORNELL, shader)
    assert not bool(film.is_uniform(out["bitmap"]))
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


@pytest.mark.parametrize("scene_id", [C.SCENE_CORNELL, C.SCENE_SPHERES,
                                      C.SCENE_CORNELL2, C.SCENE_SPHERES2])
def test_every_scene_renders_nonuniform_whitted(scene_id):
    out = _render(scene_id, C.SHADER_WHITTED)
    assert not bool(film.is_uniform(out["bitmap"]))


def test_ray_count_positive_and_sane():
    out = _render(C.SCENE_CORNELL, C.SHADER_WHITTED)
    rays = int(out["rays"])
    # At least one primary ray per pixel; shadow + specular rays add more.
    assert rays >= SIZE * SIZE
    assert rays < SIZE * SIZE * 50


@pytest.mark.slow
def test_spp_accumulation_reduces_noise():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    base = RenderConfig(width=SIZE, height=SIZE, shader=C.SHADER_PATHTRACER,
                        accelerator=C.ACC_NAIVE)
    import dataclasses
    img1 = np.asarray(render_frame(scene, cam, dataclasses.replace(base, spp=1),
                                   jax.random.PRNGKey(0))["image"])
    img2 = np.asarray(render_frame(scene, cam, dataclasses.replace(base, spp=2),
                                   jax.random.PRNGKey(0))["image"])
    img16 = np.asarray(render_frame(scene, cam, dataclasses.replace(base, spp=16),
                                    jax.random.PRNGKey(0))["image"])
    # More samples should not blow up and should change the estimate.
    assert np.isfinite(img16).all()
    assert not np.allclose(img1, img2)
    # Variance of differences between independent renders shrinks with spp.
    alt16 = np.asarray(render_frame(scene, cam, dataclasses.replace(base, spp=16),
                                    jax.random.PRNGKey(7))["image"])
    alt1 = np.asarray(render_frame(scene, cam, dataclasses.replace(base, spp=1),
                                   jax.random.PRNGKey(7))["image"])
    assert np.abs(img16 - alt16).mean() < np.abs(img1 - alt1).mean()


@pytest.mark.slow
def test_whitted_mirror_reflection_present():
    """The cornell mirror sphere must reflect scene colors (depth > 1)."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=64, height=64, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE)
    img = np.asarray(render_frame(scene, cam, cfg, jax.random.PRNGKey(0))["image"])
    cfg1 = RenderConfig(width=64, height=64, shader=C.SHADER_WHITTED,
                        accelerator=C.ACC_NAIVE, depth_max=1)
    img1 = np.asarray(render_frame(scene, cam, cfg1, jax.random.PRNGKey(0))["image"])
    # With depth 1 the mirror contributes nothing; with depth 6 it does.
    assert np.abs(img - img1).max() > 0.05


def test_depthmap_monotonic_with_distance():
    out = _render(C.SCENE_CORNELL, C.SHADER_DEPTHMAP)
    img = np.asarray(out["image"])
    assert img.max() <= 1.0 and img.min() >= 0.0
    # Gray image: all channels equal.
    np.testing.assert_allclose(img[..., 0], img[..., 1])


def test_progressive_renderer_stateful():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=4,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE)
    r = Renderer(scene, cam, cfg)
    seen = []
    r.render(callback=lambda rr: seen.append(rr.sample))
    assert seen == [1, 2, 3, 4]
    assert r.total_rays > 0
    assert r.image.shape == (SIZE, SIZE, 3)


def test_stop_render_cooperative():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=100,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE)
    r = Renderer(scene, cam, cfg)

    def stop_after_two(rr):
        if rr.sample >= 2:
            rr.stop_render()

    r.render(callback=stop_after_two)
    assert r.sample == 2


@pytest.mark.slow
def test_int_parity_accumulation_mode():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE, accumulation="int_parity")
    out = render_frame(scene, cam, cfg, jax.random.PRNGKey(0))
    cfg_f = RenderConfig(width=SIZE, height=SIZE, spp=1, shader=C.SHADER_WHITTED,
                         accelerator=C.ACC_NAIVE)
    out_f = render_frame(scene, cam, cfg_f, jax.random.PRNGKey(0))
    # At 1 spp both modes quantize the same radiance: bitmaps agree.
    np.testing.assert_array_equal(np.asarray(out["bitmap"]),
                                  np.asarray(out_f["bitmap"]))


def test_resolution_rounding_contract():
    cfg = RenderConfig(width=100, height=67).rounded()
    assert cfg.width == 96 and cfg.height == 64
    # rest <= 1 stays (reference roundDownToMultipleOf quirk, Utils.cpp:26-31).
    cfg2 = RenderConfig(width=97, height=96).rounded()
    assert cfg2.width == 97 and cfg2.height == 96


@pytest.mark.parametrize("accumulation", ["float32", "int_parity"])
def test_render_frame_auto_chunked_matches_fused(accumulation):
    """Self-chunking dispatch (VERDICT r4 #4): forcing a tiny budget splits
    the frame into per-sample, per-pixel-chunk dispatches; the result must
    be bitwise identical to the single fused dispatch."""
    from mobileraytracer_tpu.renderer import render_frame_auto

    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=2,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE,
                       accumulation=accumulation)
    key = jax.random.PRNGKey(0)
    ref = render_frame(scene, cam, cfg, key)
    # budget=1 unit -> maximal chunking (per-sample AND per-128-lane-chunk).
    out = render_frame_auto(scene, cam, cfg, key, budget=1.0)
    assert np.array_equal(np.asarray(ref["bitmap"]), np.asarray(out["bitmap"]))
    # The float image may differ by 1 ulp on the int_parity path: the
    # 8-bit unpack runs inside the fused jit in one case and eager in the
    # other, and XLA fuses the /255 differently.  The bitmap (the parity
    # artifact) is compared exactly above.
    np.testing.assert_allclose(np.asarray(ref["image"]),
                               np.asarray(out["image"]), atol=3e-7, rtol=0)
    assert int(ref["rays"]) == int(out["rays"])
    # And the auto path without a forced budget returns the fused result.
    out2 = render_frame_auto(scene, cam, cfg, key)
    assert np.array_equal(np.asarray(ref["bitmap"]),
                          np.asarray(out2["bitmap"]))
