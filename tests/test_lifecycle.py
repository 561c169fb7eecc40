"""Render lifecycle: state machine, stats line, preview, checkpoint/resume."""
import os

import jax
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.renderer import (Renderer, STATE_BUSY,
                                          STATE_FINISHED, STATE_IDLE,
                                          STATE_STOPPED)
from mobileraytracer_tpu.types import RenderConfig


def _renderer(spp=4, size=16):
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=size, height=size, spp=spp,
                       shader=C.SHADER_WHITTED, accelerator=C.ACC_NAIVE)
    return Renderer(scene, cam, cfg)


def test_state_machine_idle_busy_finished():
    r = _renderer(spp=2)
    assert r.state == STATE_IDLE
    seen = []
    r.render(callback=lambda rr: seen.append(rr.state))
    assert all(s == STATE_BUSY for s in seen)
    assert r.state == STATE_FINISHED


def test_state_machine_stopped():
    r = _renderer(spp=50)
    r.render(callback=lambda rr: rr.stop_render())
    assert r.state == STATE_STOPPED


def test_async_render_finishes_with_live_polling():
    """render_async returns immediately; state/sample/bitmap are readable
    while the worker accumulates (reference RayTrace(async=true),
    C_wrapper.cpp:283-290 + RenderTask.kt poller)."""
    import time
    r = _renderer(spp=3, size=16)
    t = r.render_async()
    assert r.state == STATE_BUSY  # set before return, never IDLE after
    polled = []
    deadline = time.time() + 120
    while r.state == STATE_BUSY and time.time() < deadline:
        polled.append((r.sample, r.bitmap.copy()))
        time.sleep(0.01)
    assert r.wait(120) == STATE_FINISHED
    assert r.sample == 3
    assert t is not None and not t.is_alive()
    # Progressive samples were observable while running.
    assert any(0 <= s <= 3 for s, _ in polled)
    assert r.bitmap.shape == (16, 16)


def test_async_stop_render_concurrent():
    """stop_render() from the polling thread cancels a running async
    render mid-frame (reference rtStopRender(wait=true),
    JNI_layer.cpp:429-462)."""
    import time
    r = _renderer(spp=500, size=16)
    r.render_async()
    deadline = time.time() + 120
    while r.sample < 2 and time.time() < deadline:
        time.sleep(0.005)
    assert r.sample >= 2, "render thread made no progress"
    r.stop_render()
    assert r.wait(120) == STATE_STOPPED
    assert 2 <= r.sample < 500
    # fps was measured while rendering.
    assert r.fps > 0


def test_async_double_start_rejected():
    import time
    r = _renderer(spp=200, size=16)
    r.render_async()
    try:
        with pytest.raises(RuntimeError):
            r.render_async()
    finally:
        r.stop_render()
        r.wait(120)


def test_stats_line_contents():
    r = _renderer(spp=1)
    r.render()
    line = r.stats_line()
    assert "r:16x16" in line and "state:FINISHED" in line
    assert "p:" in line and "l:" in line


def test_preview_is_flat_material_pass():
    r = _renderer(spp=1, size=32)
    img = r.preview()
    assert img.shape == (32, 32, 3)
    # DiffuseMaterial shows flat Kd: the green sphere region is pure green.
    assert img.max() > 0.5


def test_checkpoint_resume_bitwise(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    # Uninterrupted run.
    r_full = _renderer(spp=4)
    img_full = r_full.render()

    # Interrupted at sample 2, checkpointed, resumed in a new renderer.
    r_a = _renderer(spp=4)

    def stop_at_2(rr):
        if rr.sample == 2:
            rr.stop_render()

    r_a.render(callback=stop_at_2)
    assert r_a.sample == 2
    r_a.save_checkpoint(path)

    r_b = _renderer(spp=4)
    r_b.load_checkpoint(path)
    assert r_b.sample == 2
    img_resumed = r_b.render()
    np.testing.assert_array_equal(img_full, img_resumed)


def test_checkpoint_config_mismatch_rejected(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    r = _renderer(spp=4)
    r.save_checkpoint(path)
    r2 = _renderer(spp=8)
    with pytest.raises(ValueError):
        r2.load_checkpoint(path)
