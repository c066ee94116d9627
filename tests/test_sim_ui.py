"""UI layer + fused frame step (ref: js/renderer.js renderUI, js/main.js)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.camera import CameraInputs
from ascii_renderer_tpu.sim import ui as U
from ascii_renderer_tpu.sim.framestep import FrameState, demo_setup


def _np_bresenham(cx, cy, r, rows, cols):
    """Literal transcription of drawCircleOnBuffer (renderer.js:108-123)."""
    out = np.zeros((rows, cols), bool)
    cx, cy, r = round(cx), round(cy), round(r)

    def put(px, py):
        if 0 <= px < cols and 0 <= py < rows:
            out[py, px] = True

    x, y, err = r, 0, 0
    while x >= y:
        put(cx + x, cy + y); put(cx + y, cy + x)  # noqa: E702
        put(cx - y, cy + x); put(cx - x, cy + y)  # noqa: E702
        put(cx - x, cy - y); put(cx - y, cy - x)  # noqa: E702
        put(cx + y, cy - x); put(cx + x, cy - y)  # noqa: E702
        if err <= 0:
            y += 1
            err += 2 * y + 1
        if err > 0:
            x -= 1
            err -= 2 * x + 1
    return out


def _points_to_mask(cx, cy, r, rows, cols):
    """Single-circle mask via the batched point-collection form."""
    cxa = jnp.asarray([round(cx)], jnp.int32)
    cya = jnp.asarray([round(cy)], jnp.int32)
    ra = jnp.asarray([round(r)], jnp.int32)
    px, py, on = U._bresenham_circle_points(cxa, cya, ra)
    ok = on & (px >= 0) & (px < cols) & (py >= 0) & (py < rows)
    return np.asarray(jnp.zeros((rows, cols), bool).at[
        jnp.clip(py, 0, rows - 1).reshape(-1),
        jnp.clip(px, 0, cols - 1).reshape(-1)].max(ok.reshape(-1)))


def test_bresenham_matches_js_oracle():
    for (cx, cy, r) in [(10, 10, 0), (10, 10, 1), (10, 10, 5), (5, 18, 7.4),
                        (0, 0, 9), (30, 5, 20)]:
        got = _points_to_mask(cx, cy, r, 24, 40)
        want = _np_bresenham(cx, cy, r, 24, 40)
        np.testing.assert_array_equal(got, want, err_msg=f"{cx},{cy},{r}")


def test_border_is_pi_digits():
    cfg = Config()
    ch, m = U.border_plane(cfg, 10, 20)
    ch, m = np.asarray(ch), np.asarray(m)
    assert m[0].all() and m[-1].all() and m[:, 0].all() and m[:, -1].all()
    assert not m[1:-1, 1:-1].any()
    assert chr(ch[0, 0]) == "3" and chr(ch[0, 1]) == "1" and chr(ch[0, 2]) == "4"
    assert chr(ch[3, 0]) == "1"  # column uses y index


def test_fps_digits_right_aligned():
    # digit count follows the value like the reference's String(fps)
    # (js/renderer.js:140-147) — 8195 FPS is this framework's own measured
    # cube-config rate, so 5+ digits are realistic inputs, not edge cases
    for fps, s in [(60.0, "60"), (7.0, "7"), (123.0, "123"), (1234.0, "1234"),
                   (99999.0, "99999"), (8195.0, "8195"),
                   (1234567.0, "1234567"), (0.0, "0")]:
        ch, m = U.fps_plane(jnp.float32(fps), 8, 30)
        ch, m = np.asarray(ch), np.asarray(m)
        start = 30 - len(s) - 1
        got = "".join(chr(c) for c in ch[-1, start:start + len(s)])
        assert got == s, (fps, got)
        assert m[-1, start:start + len(s)].all()
        assert not m[:-1].any()


def test_ui_plane_draw_order_and_expiry():
    cfg = Config()
    rows, cols = 20, 40
    ripples = jnp.zeros((U.MAX_RIPPLES, 3), jnp.float32)
    # ripple centered bottom-right so its circle crosses the fps text row
    ripples = ripples.at[0].set(jnp.asarray([cols - 3.0, rows - 3.0, 0.0]))
    ch, m = U.ui_char_plane(cfg, rows, cols, jnp.float32(60.0), ripples,
                            jnp.int32(1), jnp.float32(60.0))  # radius 3
    ch = np.asarray(ch)
    assert (ch == ord("*")).any()  # ripple drawn
    # expired ripple (radius > max) disappears
    ch2, _ = U.ui_char_plane(cfg, rows, cols, jnp.float32(60.0), ripples,
                             jnp.int32(1), jnp.float32(1e6))
    assert not (np.asarray(ch2) == ord("*")).any()


def test_frame_step_end_to_end():
    cfg = Config(grid_width=32, grid_height=12)
    cfg, scene, state, step = demo_setup(cfg, backend="raytrace")
    ins = CameraInputs.from_keys({"w"})
    s1, chars, tint, frame = step(scene, state, ins, 1.0 / 60, 60.0)
    assert chars.shape == (12, 32)
    assert int(s1.frame_idx) == 1
    assert float(s1.time_ms) > 0
    # camera moved forward (+x for yaw 0)
    assert float(s1.camera.pos[0]) > float(state.camera.pos[0])
    # border burned into the frame alpha plane
    a = np.asarray(frame.a)
    assert (a[0] >= ord("0")).all() and (a[0] <= ord("9")).all()
    # ripple wiring
    s2 = s1.add_ripple(16, 6)
    assert int(s2.n_ripples) == 1
    _s3, chars3, _t, _f = step(scene, s2, ins, 1.0 / 60, 60.0)
    assert chars3.shape == (12, 32)


@pytest.mark.slow
def test_frame_step_raster_overflow_flag():
    """Fixed raster caps inside the jitted step cannot retry on overflow;
    the step must SAY a frame was inexact (FrameState.raster_overflow)
    instead of silently dropping geometry (the hazard of reinterpreting
    caps[4] as the grouped pipeline's bin capacity)."""
    from ascii_renderer_tpu.geom.tessellate import tessellate_scene
    from ascii_renderer_tpu.sim.framestep import make_frame_step

    cfg = Config(grid_width=96, grid_height=36)
    cfg, scene, state, _ = demo_setup(cfg, backend="raster")
    p, n, c = tessellate_scene(scene)
    soup = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c))
    ins = CameraInputs.from_keys(())

    # uncapped exact reference
    step0 = make_frame_step(cfg, "raster", soup=soup)
    s0, chars0, _t0, _f0 = step0(scene, state, ins, 1.0 / 60, 60.0)
    assert int(s0.raster_overflow) == 0

    # absurdly tight grouped caps: rows/pairs/bins all overflow -> flagged
    tiny = (4096, 64, 256, 2048, 32)
    step_tiny = make_frame_step(cfg, "raster", soup=soup, raster_caps=tiny)
    s1, _c1, _t1, _f1 = step_tiny(scene, state, ins, 1.0 / 60, 60.0)
    assert int(s1.raster_overflow) > 0

    # generous grouped caps: exact frame, flag clear, output matches the
    # uncapped path bit-for-bit
    big = (8192, 256, 16384, 65536, 8 * (36 // 8 + 1) * 1 * 8)
    step_big = make_frame_step(cfg, "raster", soup=soup, raster_caps=big)
    s2, chars2, _t2, _f2 = step_big(scene, state, ins, 1.0 / 60, 60.0)
    assert int(s2.raster_overflow) == 0
    assert np.array_equal(np.asarray(chars2), np.asarray(chars0))


def test_cli_offline(tmp_path, capsys):
    from ascii_renderer_tpu.app.cli import main
    out = tmp_path / "f.txt"
    rc = main(["--backend", "rt", "--frames", "1", "--cols", "32",
               "--rows", "12", "--out", str(out)])
    assert rc == 0
    text = out.read_text().splitlines()
    assert len(text) == 12 and len(text[0]) == 32
