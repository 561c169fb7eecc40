"""Gradient parity vs finite differences of the REAL reference binary
(BASELINE.md config #4).

refgold/graddriver renders the hardcoded cornellBox2 scene through the
reference engine with one material channel perturbed by +-eps; the central
difference of the resulting loss is compared against our reverse-mode
d(loss)/d(kd) on the same scene and loss.  The reference's RNG is not
seedable (shared atomic-cursor arrays), so each side averages a few
independent 16-spp estimates; tolerances cover the residual MC noise.

Loss = mean over pixels/channels of clip(mean_spp(radiance), 0, 1) — the
clip matches the reference's 8-bit bitmap quantization.
"""
import os
import pathlib
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.renderer import render_sample
from mobileraytracer_tpu.types import RenderConfig

REPO = pathlib.Path(__file__).resolve().parent.parent
DRIVER = REPO / "refgold" / "build" / "graddriver"

pytestmark = pytest.mark.skipif(
    not DRIVER.exists(),
    reason="graddriver not built (run refgold/build.sh)")

SIZE = 64
SPP = 16
MAT_IDX = 4      # back wall, light gray — large screen coverage
CH = 0
EPS = 0.05


def ref_loss(delta, runs=4, shader=1):
    """Mean loss over `runs` independent reference renders at kd+delta."""
    losses = []
    base_kd = None
    for i in range(runs):
        out = f"/tmp/refgrad_{os.getpid()}_{i}.bin"
        proc = subprocess.run(
            [str(DRIVER), "2", str(shader), str(SPP), "1", str(SIZE),
             str(SIZE), "3", str(MAT_IDX), str(CH), repr(delta), out],
            capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, proc.stderr[-500:]
        for line in proc.stdout.splitlines():
            if line.startswith("GRAD "):
                base_kd = tuple(
                    float(x) for x in
                    line.split("baseKd=")[1].split(","))
        raw = np.fromfile(out, dtype=np.int32)
        os.unlink(out)
        w, h = int(raw[0]), int(raw[1])
        bm = raw[2:]
        img = np.stack([(bm >> s) & 0xFF for s in (0, 8, 16)], -1) / 255.0
        losses.append(img.mean())
    return float(np.mean(losses)), base_kd


@pytest.mark.slow
def test_kd_gradient_matches_reference_fd():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = jax.device_put(scene)   # host-numpy tables -> traceable arrays
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE,
                       scene_id=C.SCENE_CORNELL2)

    lo, base_kd = ref_loss(+EPS)
    hi, _ = ref_loss(-EPS)
    fd = (lo - hi) / (2 * EPS)

    # Material-index parity with the reference's Scenes.cpp ordering.
    ours_kd = np.asarray(scene.materials.kd)[MAT_IDX]
    np.testing.assert_allclose(ours_kd, base_kd, atol=1e-6,
                               err_msg="material index mapping diverged")

    kd0 = jnp.asarray(scene.materials.kd)

    def loss_fn(kd, key):
        s2 = scene.replace(materials=scene.materials.replace(kd=kd))
        accum = jnp.zeros((SIZE * SIZE, 3), jnp.float32)
        for s in range(SPP):
            rgb, _ = render_sample(s2, cam, cfg, key, s,
                                   differentiable=True)
            accum = accum + rgb
        return jnp.mean(jnp.clip(accum / SPP, 0.0, 1.0))

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [np.asarray(grad_fn(kd0, jax.random.PRNGKey(seed)))[MAT_IDX, CH]
             for seed in range(3)]
    ad = float(np.mean(grads))

    # fd carries the reference's MC noise (~0.001 absolute after averaging)
    # and the eps-nonlinearity of the clip; ad carries ours.
    assert abs(ad - fd) < max(0.15 * abs(fd), 0.01), (
        f"AD {ad:.5f} vs reference FD {fd:.5f}")


@pytest.mark.slow
def test_kd_gradient_matches_reference_fd_pathtracer():
    """The flagship differentiable shader's kd-gradient vs central
    differences of the reference PathTracer (refgold/graddriver.cpp:74-79
    builds shader=2).  Russian roulette + cosine-hemisphere sampling make
    the reference FD far noisier than the Whitted case, so both sides
    average more runs and the tolerance is looser."""
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL2, 1.0)
    scene = jax.device_put(scene)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=SPP,
                       shader=C.SHADER_PATHTRACER, accelerator=C.ACC_NAIVE,
                       scene_id=C.SCENE_CORNELL2)

    lo, base_kd = ref_loss(+EPS, runs=8, shader=2)
    hi, _ = ref_loss(-EPS, runs=8, shader=2)
    fd = (lo - hi) / (2 * EPS)

    ours_kd = np.asarray(scene.materials.kd)[MAT_IDX]
    np.testing.assert_allclose(ours_kd, base_kd, atol=1e-6,
                               err_msg="material index mapping diverged")

    kd0 = jnp.asarray(scene.materials.kd)

    def loss_fn(kd, key):
        s2 = scene.replace(materials=scene.materials.replace(kd=kd))
        accum = jnp.zeros((SIZE * SIZE, 3), jnp.float32)
        for s in range(SPP):
            rgb, _ = render_sample(s2, cam, cfg, key, s,
                                   differentiable=True)
            accum = accum + rgb
        return jnp.mean(jnp.clip(accum / SPP, 0.0, 1.0))

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [np.asarray(grad_fn(kd0, jax.random.PRNGKey(seed)))[MAT_IDX, CH]
             for seed in range(4)]
    ad = float(np.mean(grads))

    assert abs(ad - fd) < max(0.3 * abs(fd), 0.02), (
        f"AD {ad:.5f} vs reference PathTracer FD {fd:.5f}")
