"""The fused frame pipeline: one jitted device program per frame.

This is the TPU answer to the reference's frame loop (js/main.js:392-431),
which crosses the CPU<->GPU boundary three times per frame (uniform upload,
readPixels, ascii re-upload — SURVEY §3.2). Here scene -> render -> UI
composite -> glyph decision is ONE compiled program; the only host transfer
is the final chars/tint readback at display time.

FrameState is the functional analog of the `state` singleton
(js/main.js:18-63): camera pose, clock, RNG, ripple effects.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ascii_renderer_tpu.core.camera import Camera, CameraInputs, update_camera
from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide
from ascii_renderer_tpu.scene.builder import SceneData
from ascii_renderer_tpu.sim import ui as ui_mod


@flax.struct.dataclass
class FrameState:
    camera: Camera
    time_ms: jnp.ndarray  # f32 clock (performance.now analog)
    frame_idx: jnp.ndarray  # i32
    rng: jax.Array  # PRNG key
    ripples: jnp.ndarray  # f32 [MAX_RIPPLES, 3] (x, y, start_ms)
    n_ripples: jnp.ndarray  # i32
    # i32, nonzero iff the last raster frame overflowed its fixed
    # raster_caps (grouped pipeline, capacities from suggest_caps_grouped)
    # and geometry was dropped: the caller must rebuild the step with
    # larger caps (the jitted step cannot retry on device). Always 0 for
    # the other backends and for capless raster.
    raster_overflow: jnp.ndarray = 0

    @staticmethod
    def create(camera: Camera, seed: int = 0) -> "FrameState":
        return FrameState(
            camera=camera,
            time_ms=jnp.float32(0.0),
            frame_idx=jnp.int32(0),
            rng=jax.random.key(seed),
            ripples=jnp.zeros((ui_mod.MAX_RIPPLES, 3), jnp.float32),
            n_ripples=jnp.int32(0),
            raster_overflow=jnp.int32(0),
        )

    def add_ripple(self, x, y) -> "FrameState":
        """Register a click ripple (handleGameClickAt, js/main.js:378-386).
        The pool is a ring buffer of MAX_RIPPLES slots."""
        slot = self.n_ripples % ui_mod.MAX_RIPPLES
        ripples = self.ripples.at[slot].set(
            jnp.asarray([x, y, self.time_ms], jnp.float32))
        return self.replace(ripples=ripples,
                            n_ripples=jnp.minimum(self.n_ripples + 1,
                                                  ui_mod.MAX_RIPPLES))


def _render_rgb_a(backend: str, scene: SceneData, cam: Camera, time_s,
                  key, cfg: Config, rows: int, cols: int, soup=None,
                  raster_caps=None, pt_packed=None):
    """Dispatch to a backend's pure render function (static choice — swapping
    backends selects a different compiled program, gpu_renderer.js:68-80)."""
    if backend == "raytrace":
        from ascii_renderer_tpu.backends.raytrace import render_rgb
        rgb = render_rgb(scene, cam, rows, cols, cfg.pixel_aspect)
        return rgb, None, jnp.int32(0)
    if backend == "raster":
        from ascii_renderer_tpu.backends.raster import render_soup
        # soup is a closed-over constant here, so the static channel-major
        # prep tables constant-fold at compile time — no per-frame cost
        from ascii_renderer_tpu.backends.raster import soup_static_prep
        pos9, attrs_t = soup_static_prep(*soup, scene)
        if raster_caps and len(raster_caps) == 5:
            # 5-tuple caps follow the GROUPED pipeline contract
            # (suggest_caps_grouped: caps[4] is BIN capacity, not the old
            # subtile2 nonempty-tile count). Fixed caps inside one jitted
            # program cannot host-retry on overflow the way
            # RasterBackend.render does, so the overflow state is surfaced
            # instead of silently dropping geometry: nonzero
            # FrameState.raster_overflow marks the frame inexact — rebuild
            # the step with caps from suggest_caps_grouped.
            from ascii_renderer_tpu.backends.raster import (HEADLINE_KERNEL,
                                                            render_soup_diag)
            rgb, diag = render_soup_diag(
                soup[0], soup[1], soup[2], scene, cam, rows, cols,
                cfg.pixel_aspect, kernel=HEADLINE_KERNEL,
                v_cap=raster_caps[0], big_cap=raster_caps[1],
                r_cap=raster_caps[2], pair_cap=raster_caps[3],
                tile_cap=raster_caps[4], pos9=pos9, attrs_t=attrs_t)
            over = ((diag["n_big"] > raster_caps[1]).astype(jnp.int32)
                    + (diag["n_rows"] > raster_caps[2]).astype(jnp.int32)
                    + (diag["n_pairs"] > raster_caps[3]).astype(jnp.int32)
                    + (diag["n_tiles_nz"] > raster_caps[4])
                    .astype(jnp.int32))
            return rgb, None, over
        elif raster_caps:
            from ascii_renderer_tpu.backends.raster import render_soup_diag
            rgb, diag = render_soup_diag(
                soup[0], soup[1], soup[2], scene, cam, rows, cols,
                cfg.pixel_aspect, kernel="mm", v_cap=raster_caps[0],
                big_cap=raster_caps[1], pos9=pos9)
            over = ((diag["n_valid"] > raster_caps[0]).astype(jnp.int32)
                    + (diag["n_big"] > raster_caps[1]).astype(jnp.int32))
            return rgb, None, over
        else:
            rgb = render_soup(soup[0], soup[1], soup[2], scene, cam, rows,
                              cols, cfg.pixel_aspect)
        return rgb, None, jnp.int32(0)
    if backend == "pathtrace":
        from ascii_renderer_tpu.backends.pathtrace import render_pt
        from ascii_renderer_tpu.ops.pt_kernel import MAX_ATLAS_TEXELS
        pt = cfg.path_tracer
        # Pallas megakernel on TPU (same gate as PathtraceBackend.render);
        # the XLA core on CPU / oversized atlases. pt_packed — the scene
        # pack precomputed OUTSIDE the frame jit (demo_setup does) — is
        # what keeps the kernel-path frame at full speed: deriving the
        # pack from the traced SceneData every frame costs ~2x the frame
        # (tools/exp_pt_scenearg.py).
        ah, aw = scene.atlas_a.shape
        atlas_ok = not (ah > 1 and aw > 1) or ah * aw <= MAX_ATLAS_TEXELS
        use_kernel = jax.default_backend() == "tpu" and atlas_ok
        rgb, a = render_pt(scene, cam, time_s, key, rows=rows, cols=cols,
                           pixel_aspect=cfg.pixel_aspect,
                           spp=pt.samples_per_batch, bounces=pt.max_bounces,
                           light_color=pt.light_color,
                           nee=pt.direct_light_sampling,
                           use_kernel=use_kernel,
                           packed=pt_packed if use_kernel else None)
        return rgb, a, jnp.int32(0)
    raise ValueError(f"unknown backend {backend!r}")




def _step_body(cfg: Config, backend: str, rows: int, cols: int, soup,
               raster_caps, pt_packed, scene: SceneData, state: FrameState,
               inputs: CameraInputs, dt_s, fps):
    """One frame, unjitted: update_camera -> backend render -> UI char
    plane -> alpha-protocol composite -> glyph decision."""
    dt_s = jnp.float32(dt_s)
    cam = update_camera(state.camera, inputs, dt_s)
    time_ms = state.time_ms + dt_s * 1000.0
    key = jax.random.fold_in(state.rng, state.frame_idx)

    rgb, a, overflow = _render_rgb_a(backend, scene, cam, time_ms / 1000.0,
                                     key, cfg, rows, cols, soup=soup,
                                     raster_caps=raster_caps,
                                     pt_packed=pt_packed)
    frame = Frame.from_float(rgb, a)

    ui_chars, ui_mask = ui_mod.ui_char_plane(
        cfg, rows, cols, fps, state.ripples, state.n_ripples, time_ms)
    frame = frame.with_overrides(ui_chars, ui_mask)

    chars, tint = glyph_decide(
        frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
        mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
        grayscale=cfg.use_grayscale)

    new_state = state.replace(camera=cam, time_ms=time_ms,
                              frame_idx=state.frame_idx + 1,
                              raster_overflow=overflow)
    return new_state, chars, tint, frame


def make_frame_step(cfg: Config, backend: str | None = None,
                    rows: int | None = None, cols: int | None = None,
                    soup=None, raster_caps=None, pt_packed=None) -> Callable:
    """Build the jitted frame step:

      step(scene, state, inputs, dt_s, fps) ->
          (state', chars u8 [H,W], tint u8 [H,W,3], Frame)

    Pipeline per frame (all on device):
      update_camera -> backend render -> UI char plane -> alpha-protocol
      composite -> glyph decision (quantize + modal filter).

    raster_caps (backend='raster' only): a 5-tuple from
    backends.raster.suggest_caps_grouped — (v_cap, big_cap, r_cap,
    pair_cap, bin_cap), the GROUPED-pipeline contract (the last entry is
    bin capacity). Fixed caps cannot host-retry inside one compiled
    program, so an overflowing frame sets state'.raster_overflow nonzero
    (the count of exceeded caps) and the caller must rebuild the step with
    regrown caps. A 2-tuple (v_cap, big_cap) selects the mid-scale channel
    pipeline with the same overflow reporting. With raster_caps=None the
    uncapped exact path runs and raster_overflow is always 0.

    pt_packed (backend='pathtrace', TPU kernel path only): the
    pack_scene_entries(scene) 5-tuple, precomputed once per scene and
    closed over — it must describe the SAME scene passed at call time
    (exactly as `soup` must for raster). demo_setup wires it; without it
    the step re-derives the pack inside the jit at ~2x frame cost.
    """
    backend = backend or cfg.default_backend
    rows = rows or cfg.grid_height
    cols = cols or cfg.grid_width
    return jax.jit(functools.partial(_step_body, cfg, backend, rows, cols,
                                     soup, raster_caps, pt_packed))


def make_batched_frame_step(cfg: Config, backend: str | None = None,
                            rows: int | None = None, cols: int | None = None,
                            soup=None, raster_caps=None,
                            pt_packed=None) -> Callable:
    """Multi-frame batched dispatch (SURVEY §7: "render N frames per host
    callback"): lax.scan the fused frame step over a frame sequence so
    per-dispatch host overhead amortizes across N frames.

      step_n(scene, state, inputs_seq, dt_seq, fps) ->
          (state', chars u8 [N,H,W], tint u8 [N,H,W,3])

    inputs_seq is a CameraInputs pytree with [N]-leading leaves (a camera
    trajectory — e.g. broadcast one CameraInputs for held keys); dt_seq is
    f32 [N]. The UI FPS readout uses the single fps scalar for the whole
    batch (the readout lags by a batch, exactly as the reference's lags by
    a frame)."""
    backend = backend or cfg.default_backend
    rows = rows or cfg.grid_height
    cols = cols or cfg.grid_width
    body = functools.partial(_step_body, cfg, backend, rows, cols, soup,
                             raster_caps, pt_packed)

    def step_n(scene: SceneData, state: FrameState, inputs_seq, dt_seq, fps):
        def scan_body(st, xs):
            inputs, dt_s = xs
            st2, chars, tint, _frame = body(scene, st, inputs, dt_s, fps)
            return st2, (chars, tint)

        state2, (chars_n, tint_n) = jax.lax.scan(
            scan_body, state, (inputs_seq, dt_seq))
        return state2, chars_n, tint_n

    return jax.jit(step_n)


def broadcast_inputs(inputs: CameraInputs, n: int) -> CameraInputs:
    """Stack one CameraInputs into an [n]-leading trajectory (held keys)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (n,) + jnp.asarray(x).shape), inputs)


def demo_setup(cfg: Config | None = None, backend: str | None = None,
               builder=None, batch: int = 0
               ) -> Tuple[Config, SceneData, FrameState, Callable]:
    """Scene + initial state + compiled step (init() analog,
    js/main.js:173-314). ``builder`` overrides the demo scene. batch > 0
    returns the N-frame batched step (make_batched_frame_step) instead."""
    cfg = cfg or Config()
    backend = backend or cfg.default_backend
    if builder is None:
        from ascii_renderer_tpu.scene.demo import create_demo_scene
        from ascii_renderer_tpu.atlas.io import demo_atlas
        sb = create_demo_scene()
        sb.set_atlas(demo_atlas())
        if backend == "raster":
            sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    else:
        sb = builder
    # exact primitive counts: the demo scene is fixed for the session, and
    # the tracer streams pay per PADDED entry (~30% fewer entry rows than
    # the default min_pad=8)
    scene = sb.build(min_pad=1)
    soup = None
    pt_packed = None
    if backend == "raster":
        from ascii_renderer_tpu.geom.tessellate import tessellate_scene
        p, n, c = tessellate_scene(scene)
        soup = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c))
    elif backend == "pathtrace":
        from ascii_renderer_tpu.backends.pathtrace import pack_scene_entries
        pt_packed = pack_scene_entries(scene)
    state = FrameState.create(scene.camera)
    if batch > 0:
        step = make_batched_frame_step(cfg, backend, soup=soup,
                                       pt_packed=pt_packed)
    else:
        step = make_frame_step(cfg, backend, soup=soup, pt_packed=pt_packed)
    return cfg, scene, state, step
