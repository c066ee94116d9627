"""Aux subsystems: accumulation/adaptive sampling, checkpoint/resume,
profiling, text overlay, legacy adapter, renderer facade (SURVEY §5)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ascii_renderer_tpu.core.config import Config, AdaptiveConfig, PathTracerConfig
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.sim.accum import (AccumState, ProgressivePathTracer,
                                          accumulate, active_mask)
from ascii_renderer_tpu.utils import checkpoint as ckpt
from ascii_renderer_tpu.utils.profiling import FrameStats, dump_preview, log
from ascii_renderer_tpu.ascii.overlay import TextOverlay
from ascii_renderer_tpu.scene.builder import SceneBuilder, from_legacy_object
from ascii_renderer_tpu.scene.demo import create_demo_scene


def test_welford_accumulation_matches_numpy():
    rng = np.random.default_rng(0)
    cam = Camera.create()
    st = AccumState.create(4, 6)
    samples = rng.random((10, 4, 6, 3)).astype(np.float32)
    for s in samples:
        st, disp, act = accumulate(st, jnp.asarray(s), cam,
                                   max_tolerance=0.0,  # never converge
                                   max_samples=1000)
    np.testing.assert_allclose(np.asarray(st.mean), samples.mean(0),
                               rtol=1e-5, atol=1e-6)
    var = np.asarray(st.m2) / (np.asarray(st.count)[..., None] - 1)
    np.testing.assert_allclose(var, samples.var(0, ddof=1), rtol=1e-4,
                               atol=1e-5)


def test_convergence_freezes_pixels_and_caps():
    cam = Camera.create()
    st = AccumState.create(2, 2)
    const = jnp.ones((2, 2, 3)) * 0.5  # zero variance -> converges at k=2
    for _ in range(5):
        st, _d, act = accumulate(st, const, cam, max_tolerance=0.1,
                                 max_samples=64)
    assert float(st.count.max()) == 2.0  # froze after variance estimate
    assert not bool(act.any())
    # max_samples cap
    st = AccumState.create(2, 2)
    key = jax.random.key(0)
    for i in range(6):
        noise = jax.random.uniform(jax.random.fold_in(key, i), (2, 2, 3))
        st, _d, _a = accumulate(st, noise, cam, max_tolerance=1e-9,
                                max_samples=4)
    assert float(st.count.max()) == 4.0


def test_camera_move_resets():
    cam = Camera.create(pos=(0, 0, 0))
    st = AccumState.create(2, 2)
    st, _, _ = accumulate(st, jnp.ones((2, 2, 3)), cam, max_tolerance=0.1,
                          max_samples=64)
    assert float(st.count.max()) == 1.0
    cam2 = Camera.create(pos=(1, 0, 0))
    st, _, _ = accumulate(st, jnp.zeros((2, 2, 3)), cam2, max_tolerance=0.1,
                          max_samples=64)
    assert float(st.count.max()) == 1.0  # reset then one sample
    np.testing.assert_allclose(np.asarray(st.mean), 0.0)


def test_progressive_pt_reduces_variance():
    cfg = Config(path_tracer=PathTracerConfig(samples_per_batch=4,
                                              max_bounces=2),
                 adaptive=AdaptiveConfig(max_tolerance=0.05, max_samples=8))
    scene = create_demo_scene().build()
    p = ProgressivePathTracer(cfg, scene, rows=8, cols=12)
    d1, _a, act1 = p.step(scene.camera)
    for _ in range(3):
        d, _a, act = p.step(scene.camera)
    assert float(jnp.asarray(act).mean()) <= float(jnp.asarray(act1).mean()) + 1e-6
    assert np.isfinite(np.asarray(d)).all()


def test_progressive_poll_done_lags_then_stops():
    """poll_done is the pipelined convergence probe: it must never fire
    while pixels are active, must fire within `lag` batches once every
    pixel froze, and must not consume probes newer than the lag window
    (the async transfer may not have landed)."""
    cfg = Config(path_tracer=PathTracerConfig(samples_per_batch=4,
                                              max_bounces=2),
                 adaptive=AdaptiveConfig(max_tolerance=1e9, max_samples=4))
    # tolerance 1e9: every pixel converges as soon as k >= 2 samples, so
    # convergence lands at a known, early step
    scene = create_demo_scene().build()
    p = ProgressivePathTracer(cfg, scene, rows=8, cols=12)
    fired_at = None
    for i in range(1, 10):
        p.step(scene.camera)
        if p.poll_done() and fired_at is None:
            fired_at = i
            break
    assert fired_at is not None, "poll never fired after convergence"
    # sync ground truth: by the time poll fired, the state really is done
    assert p.done
    # and it fired within lag(2) of the true convergence step (the CI
    # test passes once Welford has a variance, k>=2 -> converged by
    # step 3 -> that probe is consumable at step 5)
    assert fired_at <= 5


def test_checkpoint_roundtrip_framestate(tmp_path):
    from ascii_renderer_tpu.sim.framestep import FrameState
    cam = Camera.create(pos=(1, 2, 3), yaw=0.5)
    st = FrameState.create(cam, seed=3).add_ripple(4, 5)
    path = str(tmp_path / "state.npz")
    ckpt.save_pytree(path, st)
    st2 = ckpt.load_pytree(path, FrameState.create(Camera.create()))
    np.testing.assert_allclose(np.asarray(st2.camera.pos), [1, 2, 3])
    assert int(st2.n_ripples) == 1
    # PRNG key round-trips to the same stream
    a = jax.random.uniform(st.rng, (3,))
    b = jax.random.uniform(st2.rng, (3,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_scene_json(tmp_path):
    sb = create_demo_scene()
    path = str(tmp_path / "scene.json")
    ckpt.save_scene_json(path, sb)
    sb2 = ckpt.load_scene_json(path)
    assert sb2.to_unified()["geometry"] == sb.to_unified()["geometry"]


def test_accum_state_checkpoint(tmp_path):
    st = AccumState.create(3, 4)
    st, _, _ = accumulate(st, jnp.ones((3, 4, 3)) * 0.3, Camera.create(),
                          max_tolerance=0.1, max_samples=64)
    p = str(tmp_path / "accum.npz")
    ckpt.save_pytree(p, st)
    st2 = ckpt.load_pytree(p, AccumState.create(3, 4))
    np.testing.assert_allclose(np.asarray(st2.mean), np.asarray(st.mean))
    np.testing.assert_allclose(np.asarray(st2.count), np.asarray(st.count))


def test_frame_stats_and_preview(tmp_path, capsys):
    fs = FrameStats(window=10)
    import time
    for _ in range(4):
        fs.tick()
        time.sleep(0.01)
    fs.tick()
    s = fs.summary()
    assert s["fps"] > 0 and s["p50_ms"] >= 9.0
    frame = Frame.blank(4, 4)
    path = dump_preview(frame, str(tmp_path / "p.png"))
    assert os.path.exists(path)
    log("test_event", foo=1)


def test_text_overlay_cadence_and_hit():
    cfg = Config(grid_width=8, grid_height=4)
    ov = TextOverlay(cfg, mode="row")
    chars = np.full((4, 8), ord("x"), np.uint8)
    ov.set_chars(chars)
    ov.update()  # refreshes row 0 only
    assert ov.text.splitlines()[0] == "x" * 8
    assert ov.text.splitlines()[1] == " " * 8
    ov.update()
    assert ov.text.splitlines()[1] == "x" * 8
    # interval mode
    ov2 = TextOverlay(cfg, mode="interval", interval_n=2)
    ov2.set_chars(chars)
    ov2.update()
    assert ov2.text.splitlines()[3] == " " * 8
    ov2.update()
    assert ov2.text.splitlines()[3] == "x" * 8
    # frame decode path matches the canonical quantization
    f = Frame.blank(4, 8)
    ov.set_frame(f)
    ov.refresh_all()
    assert ov.text.splitlines()[0] == "@" * 8  # black -> ramp[0]
    assert ov.cell_at(100.0, 100.0) == (7, 3)  # clamped
    assert ov.cell_at(9.0, 17.0) == (1, 1)


def test_legacy_scene_adapter():
    legacy = {
        "camera": {"pos": [0, 1, 5], "yaw": 0.2},
        "spheres": [{"p": [0, 1, 0], "r": 1.0, "m": 6}],
        "planes": [{"p": [0, 1, 0, 0], "m": 1}],
        "tris": [{"a": [0, 0, 0], "b": [1, 0, 0], "c": [0, 1, 0], "m": 3}],
        "envLight": {"color": [0.2, 0.3, 0.4], "intensity": 1.0},
        "dirLight": {"dir": [0, -1, 0], "color": [1, 1, 1], "intensity": 0.8},
    }
    sb = from_legacy_object(legacy)
    u = sb.to_unified()
    assert len(u["geometry"]["spheres"]) == 1
    assert len(u["geometry"]["planes"]) == 1
    assert len(u["geometry"]["tris"]) == 1
    # GLASS (m=6) promoted to mirror
    sphere_mat = u["geometry"]["spheres"][0]["matId"]
    assert u["materials"]["table"][str(sphere_mat)]["reflective"]
    assert u["lights"]["env"]["color"] == [0.2, 0.3, 0.4]
    assert len(u["lights"]["directionals"]) == 1
    scene = sb.build()  # packs cleanly
    assert int(scene.n_pln) == 1


def test_renderer_facade_get_pixels():
    from ascii_renderer_tpu.backends.registry import Renderer
    from ascii_renderer_tpu.scene.demo import create_rt_demo_scene
    cfg = Config(grid_width=16, grid_height=8)
    r = Renderer(cfg, backend="rt")
    scene = create_rt_demo_scene().build()
    r.set_scene(scene)
    assert r.get_pixels() is None
    f = r.render_raw({"time": 0.0, "camera": scene.camera})
    assert f is not None
    px = r.get_pixels()
    assert px.shape == (8, 16, 4)
    flipped = r.get_pixels(flip_y=True)
    np.testing.assert_array_equal(px[::-1], flipped)


def test_bench_exactness_gate_trips_on_failure():
    """The bench headline record must be zeroed (and flagged) when the
    on-device exactness canary fails — the gate is un-skippable by
    construction (VERDICT r3 item 3: a silently folded exact-3-split
    must not produce a recordable headline number)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    ok = bench._headline_record(1234.5, "m", "ok")
    assert ok["value"] == 1234.5 and ok["exactness"] == "ok"
    assert "error" not in ok

    bad = bench._headline_record(1234.5, "m", "FAIL:pack_blocked")
    assert bad["value"] == 0.0 and bad["vs_baseline"] == 0.0
    assert "error" in bad and bad["exactness"] == "FAIL:pack_blocked"

    from ascii_renderer_tpu.utils.exactness import verdict
    assert verdict({"a": True, "b": True}) == "ok"
    assert verdict({"a": True, "b": False, "c": False}) == "FAIL:b,c"


def test_exactness_checks_pass_on_this_backend():
    """The canary's own checks hold on the test backend (CPU: barriers
    survive jit; the Mosaic half is interpret-mode here and is verified
    on device by bench.py / tools/check_exact_tpu.py)."""
    from ascii_renderer_tpu.utils.exactness import run_checks, verdict
    assert verdict(run_checks()) == "ok"


def test_bench_dispatch_bound_reporting():
    """When the fitted slope <= the measured dispatch floor the config
    record must say dispatch_bound instead of printing extrapolation
    noise as an FPS fact (VERDICT r3 item 7)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # slope below floor: dispatch-bound, no top-level fps
    r = bench._rate_fields(1.0e-4, 1.43e-4, 12, "80x24", 0.3, 0.03)
    assert r.get("dispatch_bound") is True
    assert "fps" not in r and "mtris_s" not in r
    assert r["raw_extrapolated"]["fps"] == 1.0 / 1.0e-4

    # slope above floor: a real measurement
    r2 = bench._rate_fields(5.0e-4, 1.43e-4, 1024, "240x135", 0.01, 0.03)
    assert "dispatch_bound" not in r2
    assert r2["fps"] == 1.0 / 5.0e-4


def test_perceptual_welford_matches_reference_math():
    """stats_mode="perceptual" reproduces the reference's adaptive loop
    (js/render/renderer.js:176-199): scalar y = 0.3r + 0.59g + 0.11b
    Welford, CI = 1.96*sqrt(var/k) vs maxTol*max(mean, 1e-8)."""
    rng = np.random.default_rng(5)
    H, W, N = 4, 6, 6
    batches = rng.random((N, H, W, 3)).astype(np.float32) * 0.2
    cam = Camera.create(pos=(0, 0, 0))
    st = AccumState.create(H, W)
    tol, cap = 0.5, 64

    # numpy transcription of the reference loop (active-gating included)
    k = np.zeros((H, W)); mean = np.zeros((H, W)); m2 = np.zeros((H, W))
    active = np.ones((H, W), bool)
    for b in batches:
        st, _disp, act = accumulate(
            st, jnp.asarray(b), cam, max_tolerance=tol, max_samples=cap,
            stats_mode="perceptual")
        np.testing.assert_array_equal(np.asarray(act), active)
        y = 0.3 * b[..., 0] + 0.59 * b[..., 1] + 0.11 * b[..., 2]
        kn = np.where(active, k + 1, k)
        d = y - mean
        mn = np.where(active, mean + d / np.maximum(kn, 1), mean)
        m2 = np.where(active, m2 + d * (y - mn), m2)
        k, mean = kn, mn
        var = np.where(k >= 2, m2 / np.maximum(k - 1, 1), 0.0)
        ci = 1.96 * np.sqrt(var / np.maximum(k, 1))
        conv = (k >= 2) & (ci <= tol * np.maximum(mean, 1e-8))
        active = ~conv & (k < cap)
    np.testing.assert_allclose(np.asarray(st.mean_y), mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.m2_y), m2, atol=1e-6)
    # some pixels actually converged under the loose tolerance
    assert (~active).any()


def test_adaptive_block_skip_identical_trajectory():
    """ProgressivePathTracer with adaptive_skip follows the IDENTICAL
    accumulator trajectory as the full render (skipped device blocks
    return zeros that accumulate() never folds), while actually skipping
    blocks once regions converge (VERDICT r4 item 4)."""
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.sim.accum import active_mask

    cfg = Config(
        path_tracer=PathTracerConfig(samples_per_batch=1, max_bounces=2),
        adaptive=AdaptiveConfig(max_tolerance=0.9, max_samples=3),
    )
    scene = create_demo_scene().build()
    rows, cols = 16, 96  # pc=1536 -> 2 device blocks per sample slice
    cam = scene.camera
    ptA = ProgressivePathTracer(cfg, scene, rows, cols, use_kernel=True,
                                adaptive_skip=True)
    ptB = ProgressivePathTracer(cfg, scene, rows, cols, use_kernel=True,
                                adaptive_skip=False)
    skipped_any = False
    for _ in range(5):
        act = active_mask(ptA.state, max_tolerance=0.9, max_samples=3)
        n_act = int(np.asarray(act).sum())
        pc = act.size
        # render_pt compacts actives to the stream front, so the blocks
        # actually dispatched per sample slice = ceil(n_act/1024); the
        # rest of the ceil(pc/1024) are gated off on device.
        if ptA._batch >= 2 and -(-n_act // 1024) < -(-pc // 1024):
            skipped_any = True
        dA, aA, _ = ptA.step(cam)
        dB, aB, _ = ptB.step(cam)
        np.testing.assert_array_equal(np.asarray(aA), np.asarray(aB))
        np.testing.assert_array_equal(np.asarray(dA), np.asarray(dB))
        np.testing.assert_array_equal(np.asarray(ptA.state.count),
                                      np.asarray(ptB.state.count))
        np.testing.assert_array_equal(np.asarray(ptA.state.mean),
                                      np.asarray(ptB.state.mean))
    assert skipped_any, "no device block ever became skippable"
