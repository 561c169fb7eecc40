"""Material-recovery loop (BASELINE.md config #4): differentiable
albedo recovery from target renders, with optimizer checkpoint/resume."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.parallel import mesh as pmesh
from mobileraytracer_tpu.parallel.recover import recover_materials
from mobileraytracer_tpu.renderer import render_frame
from mobileraytracer_tpu.types import RenderConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) platform")


def _setup():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = jax.device_put(scene)
    cfg = RenderConfig(width=32, height=32, spp=2, shader=C.SHADER_WHITTED,
                       accelerator=C.ACC_NAIVE, scene_id=C.SCENE_CORNELL2)
    target = render_frame(scene, cam, cfg, jax.random.PRNGKey(7))["image"]
    true_kd = np.asarray(scene.materials.kd)
    # Start from flat gray: every diffuse material wrong.
    kd0 = jnp.where(jnp.asarray(true_kd) > -1, 0.5, 0.5)
    return scene, cam, cfg, target, true_kd, kd0


@pytest.mark.slow
def test_recover_cornell2_albedo(tmp_path):
    scene, cam, cfg, target, true_kd, kd0 = _setup()
    m = pmesh.make_mesh()
    ck = str(tmp_path / "opt.npz")
    params1, losses = recover_materials(
        scene, cam, cfg, target, m, steps=150, params_subset=("kd",),
        learning_rate=0.05, init_params={"kd": kd0},
        checkpoint_path=ck, checkpoint_every=50)
    # Fine-tune phase: smaller steps + 4 spp settle the low-coverage
    # materials (the yellow triangle covers ~10 pixels at 32x32; at 2 spp
    # the shared-NEE gradient noise parks the floor ~0.06 off its optimum
    # — measured identically at the round-4 and round-5 code, so a test
    # calibration matter, fixed by halving the fine-tune gradient noise).
    import dataclasses
    params, losses2 = recover_materials(
        scene, cam, dataclasses.replace(cfg, spp=4), target, m, steps=120,
        params_subset=("kd",), learning_rate=0.01, init_params=params1,
        base_key=jax.random.PRNGKey(55))
    losses = np.concatenate([losses, losses2])

    # The loss floor is the MC-noise mismatch between independent draws of
    # the true scene (the target was one spp=2 draw); measure it at the
    # true materials and require the *excess* loss to drop 10x.
    floor, _ = pmesh.train_step_sharded(scene, cam, cfg,
                                        jax.random.PRNGKey(123), target, m)
    floor = float(floor)
    assert losses[-1] - floor < (losses[0] - floor) / 10, (
        losses[0], losses[-1], floor)

    # Well-covered diffuse materials recover within 5%: back wall (4),
    # floor (6), left red (8), right blue (9).  The yellow triangle (0)
    # covers only ~10 pixels at 32x32, so its information-limited estimate
    # gets a looser 0.1 bound.
    got = np.asarray(params["kd"])
    for idx in (4, 6, 8, 9):
        np.testing.assert_allclose(
            got[idx], true_kd[idx], atol=0.05,
            err_msg=f"material {idx} not recovered")
    np.testing.assert_allclose(got[0], true_kd[0], atol=0.1,
                               err_msg="material 0 not recovered")

    # Resuming from the step-100 checkpoint reproduces phase 1's final
    # state exactly (deterministic per-(pixel, sample, step) keys).
    params2, _ = recover_materials(
        scene, cam, cfg, target, m, steps=150, params_subset=("kd",),
        learning_rate=0.05, init_params={"kd": kd0},
        checkpoint_path=ck, checkpoint_every=50, resume=True)
    np.testing.assert_allclose(np.asarray(params2["kd"]),
                               np.asarray(params1["kd"]), atol=1e-5)
