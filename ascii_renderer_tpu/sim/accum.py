"""Temporal accumulation + per-pixel adaptive sampling.

Revives the reference's dormant pipeline (js/render/renderer.js:65-210,
js/render/targets.js, config.ADAPTIVE — present but unreachable in the live
path, SURVEY §2 row 21) as first-class functional state:

  - Welford per-pixel statistics (count k, mean, M2) over path-traced
    sample batches;
  - convergence test: 95% confidence interval 1.96 * sigma / sqrt(k)
    against a RELATIVE tolerance (ADAPTIVE.MAX_TOLERANCE, default 10%)
    of the mean, capped at MAX_SAMPLES;
  - two statistics modes (stats_mode): "rgb" (default) Welford-tracks
    linear per-channel RGB and tests a mean-of-channels CI — a deliberate
    divergence from the reference, which Welford-tracks a single
    PERCEPTUAL luminance (0.3/0.59/0.11 weights after inverse display
    gamma, js/render/renderer.js:179-183; per-channel stats cannot hide
    chroma-only noise under a luminance test). "perceptual" is the
    reference-parity mode: scalar y = 0.3r + 0.59g + 0.11b statistics
    with the reference's max(mean, 1e-8) floor — computed on the linear
    radiance directly, which is what the reference's invGamma pow
    recovers from its gamma-encoded display bytes (the byte-quantization
    round trip is not reproduced);
  - an active-pixel mask (the reference's LUMINANCE mask texture) gating
    further accumulation — converged pixels freeze, which both stops
    their variance drift and documents progress;
  - camera-motion reset (ADAPTIVE.RESET_ON_CAMERA_CHANGE): any pose
    change clears the statistics (renderer.js:101-124).

On TPU the mask does not skip work inside a batch (static shapes); the
saving is across batches: `done` short-circuits whole-frame refinement,
and per-pixel freezing keeps converged estimates exact.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.core.config import Config


@flax.struct.dataclass
class AccumState:
    count: jnp.ndarray  # f32 [H, W] — samples accumulated per pixel
    mean: jnp.ndarray  # f32 [H, W, 3]
    m2: jnp.ndarray  # f32 [H, W, 3] — sum of squared deviations
    cam_sig: jnp.ndarray  # f32 [5] — (pos, yaw, pitch) signature
    # scalar perceptual-luminance Welford stats (the reference's single
    # 0.3/0.59/0.11 channel, renderer.js:179-183) — maintained alongside
    # the RGB stats so stats_mode="perceptual" is available without a
    # state-shape change at mode switch
    mean_y: jnp.ndarray  # f32 [H, W]
    m2_y: jnp.ndarray  # f32 [H, W]
    # cached alpha/override plane: a frozen pixel keeps the alpha byte
    # from its last ACTIVE batch (the reference's converged pixels
    # likewise persist their last written RGBA). The center-ray override
    # decision is deterministic per camera pose, so the cached byte is
    # exactly what a full render would produce — which lets render_pt
    # gate the phase-1 probe with the same adaptive mask as the samples.
    alpha: jnp.ndarray  # u8 [H, W]

    @staticmethod
    def create(rows: int, cols: int) -> "AccumState":
        return AccumState(
            count=jnp.zeros((rows, cols), jnp.float32),
            mean=jnp.zeros((rows, cols, 3), jnp.float32),
            m2=jnp.zeros((rows, cols, 3), jnp.float32),
            cam_sig=jnp.full((5,), jnp.inf, jnp.float32),
            mean_y=jnp.zeros((rows, cols), jnp.float32),
            m2_y=jnp.zeros((rows, cols), jnp.float32),
            alpha=jnp.full((rows, cols), 255, jnp.uint8),
        )


def _signature(cam: Camera) -> jnp.ndarray:
    return jnp.concatenate([cam.pos, cam.yaw[None], cam.pitch[None]])


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(rgb, axis=-1)


def perceptual_luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's adaptive-sampling channel (renderer.js:183)."""
    return 0.3 * rgb[..., 0] + 0.59 * rgb[..., 1] + 0.11 * rgb[..., 2]


def active_mask(state: AccumState, *, max_tolerance: float,
                max_samples: int, stats_mode: str = "rgb") -> jnp.ndarray:
    """Pixels still needing samples: CI(95%) > tol * mean, k < cap
    (renderer.js:179-199). stats_mode: see the module docstring —
    "rgb" tests mean-of-channel variances; "perceptual" is the
    reference-parity scalar-luminance test incl. its 1e-8 mean floor."""
    k = jnp.maximum(state.count, 1.0)
    if stats_mode == "perceptual":
        var = state.m2_y / jnp.maximum(k - 1.0, 1.0)
        ci = 1.96 * jnp.sqrt(jnp.maximum(var, 0.0) / k)
        ref = jnp.maximum(state.mean_y, 1e-8)
    else:
        var = luminance(state.m2 / jnp.maximum(k - 1.0, 1.0)[..., None])
        ci = 1.96 * jnp.sqrt(jnp.maximum(var, 0.0) / k)
        ref = jnp.maximum(luminance(jnp.abs(state.mean)), 1e-3)
    unconverged = ci > max_tolerance * ref
    warmup = state.count < 2.0  # need >= 2 samples for a variance estimate
    return (warmup | unconverged) & (state.count < max_samples)


def accumulate(state: AccumState, sample_rgb: jnp.ndarray, cam: Camera,
               *, max_tolerance: float, max_samples: int,
               reset_on_camera_change: bool = True,
               stats_mode: str = "rgb", sample_alpha=None):
    """Fold one sample batch (mean of a batch counts as ONE sample here,
    matching the reference accumulating per-frame results). Returns
    (state', display_rgb, active_mask). sample_alpha (optional u8 [H,W]):
    folded into state.alpha for ACTIVE pixels only — frozen pixels keep
    their cached byte (see AccumState.alpha), so a render that skipped
    them (render_pt's gated phase-1 probe) leaves the display plane
    exact."""
    sig = _signature(cam)
    if reset_on_camera_change:
        moved = jnp.any(jnp.abs(sig - state.cam_sig) > 1e-7)
        zero = AccumState.create(*state.count.shape)
        state = jax.tree.map(
            lambda z, s: jnp.where(moved, z, s),
            zero.replace(cam_sig=sig), state.replace(cam_sig=sig))

    act = active_mask(state, max_tolerance=max_tolerance,
                      max_samples=max_samples, stats_mode=stats_mode)
    k1 = state.count + 1.0
    delta = sample_rgb - state.mean
    mean1 = state.mean + delta / k1[..., None]
    m21 = state.m2 + delta * (sample_rgb - mean1)
    y = perceptual_luminance(sample_rgb)
    delta_y = y - state.mean_y
    mean_y1 = state.mean_y + delta_y / k1
    m2_y1 = state.m2_y + delta_y * (y - mean_y1)

    upd = act[..., None]
    new = state.replace(
        count=jnp.where(act, k1, state.count),
        mean=jnp.where(upd, mean1, state.mean),
        m2=jnp.where(upd, m21, state.m2),
        mean_y=jnp.where(act, mean_y1, state.mean_y),
        m2_y=jnp.where(act, m2_y1, state.m2_y),
        alpha=(state.alpha if sample_alpha is None
               else jnp.where(act, sample_alpha, state.alpha)),
    )
    display = jnp.where(new.count[..., None] > 0, new.mean, sample_rgb)
    return new, display, act


class ProgressivePathTracer:
    """Progressive refinement driver over the PT backend: each call adds one
    spp batch to the accumulator; `done` when every pixel converged. The
    functional analog of the dead accum/adaptive pipeline's render loop.

    Adaptive WORK-saving (not just display): with adaptive_skip (default,
    kernel path only) the pre-batch active mask is fed to render_pt as
    pixel_active — render_pt COMPACTS active pixels to the front of the
    ray stream so the megakernel's block gate skips the contiguous
    converged tail, making per-batch work scale with the active-pixel
    count (the near-per-pixel ideal; plain block gating on the row order
    skipped ~0% of blocks at 26% active pixels). Because the kernel RNG
    is a pure function of (pixel uid, seed) and accumulate() freezes
    exactly the masked pixels, the accumulator trajectory is
    bit-IDENTICAL to a full render (tested); only the wall-clock drops
    as the image converges. The phase-1 probe is gated by the same mask;
    frozen pixels' alpha persists in AccumState.alpha. A camera move
    forces a full batch so the post-reset frame re-samples everything."""

    def __init__(self, cfg: Config, scene, rows: int | None = None,
                 cols: int | None = None, use_kernel: bool | None = None,
                 adaptive_skip: bool = True):
        import functools
        from ascii_renderer_tpu.backends.pathtrace import (
            render_pt, pack_scene_entries)

        self.cfg = cfg
        self.rows = rows or cfg.grid_height
        self.cols = cols or cfg.grid_width
        self.scene = scene
        pt = cfg.path_tracer
        ad = cfg.adaptive
        if use_kernel is None:  # megakernel on real TPU, channel core else
            use_kernel = jax.default_backend() == "tpu"
        # Kernel scene pack precomputed ONCE (deriving it from the traced
        # SceneData inside the step jit costs ~2x the frame on TPU,
        # tools/exp_pt_scenearg.py); the arrays ride as jit args so a
        # same-shape scene swap would not retrace. aw/ah/sph_rows are
        # static kernel shape params, closed over.
        self._pack_args = ()
        pk_static = None
        if use_kernel:
            pp, af, aw, ah, sr = pack_scene_entries(scene)
            self._pack_args = (pp, af)
            pk_static = (aw, ah, sr)
        render = functools.partial(
            render_pt, rows=self.rows, cols=self.cols,
            pixel_aspect=cfg.pixel_aspect, spp=pt.samples_per_batch,
            bounces=pt.max_bounces, light_color=pt.light_color,
            nee=pt.direct_light_sampling, use_kernel=use_kernel)
        skip = adaptive_skip and ad.enabled and use_kernel

        def _step(state, scene, camera, t, key, *pack):
            pa = None
            if skip:
                act_pre = active_mask(
                    state, max_tolerance=ad.max_tolerance,
                    max_samples=ad.max_samples, stats_mode=ad.stats_mode)
                moved = jnp.any(
                    jnp.abs(_signature(camera) - state.cam_sig) > 1e-7)
                pa = act_pre | moved
            packed = (pack + pk_static) if pack else None
            rgb, a = render(scene, camera, t, key, pixel_active=pa,
                            packed=packed)
            state, display, act = accumulate(
                state, rgb, camera, max_tolerance=ad.max_tolerance,
                max_samples=ad.max_samples,
                reset_on_camera_change=ad.reset_on_camera_change,
                stats_mode=ad.stats_mode, sample_alpha=a)
            # display alpha: the cache — frozen pixels keep their last
            # active byte (the skip path never recomputes them)
            return state, display, state.alpha, act

        self._step_fn = jax.jit(_step)
        self.state = AccumState.create(self.rows, self.cols)
        self._batch = 0
        import collections
        # bounded: a caller that steps without ever polling (debug paths,
        # long interactive loops) must not grow the probe queue and its
        # retained device scalars without bound. Dropping the OLDEST
        # probe is safe for poll_done's contract — convergence is
        # monotone between camera moves, so any later probe reads the
        # same-or-fewer active pixels.
        self._inflight = collections.deque(maxlen=64)

    def step(self, camera: Camera, time_sec: float = 0.0):
        """One refinement batch. Returns (display_rgb, alpha, active_mask)."""
        key = jax.random.key(self._batch)
        self._batch += 1
        self.state, display, a, act = self._step_fn(
            self.state, self.scene, camera, jnp.float32(time_sec), key,
            *self._pack_args)
        # pipelined convergence probe: start the tiny any-active readback
        # now; poll_done() consumes it `lag` steps later, by which time
        # the async transfer has landed — no tunnel round trip, no
        # dispatch-queue drain (a sync `done` check costs a full ~30 ms
        # RTT AND a pipeline bubble every call)
        any_act = jnp.any(act)
        try:
            any_act.copy_to_host_async()
        except Exception:  # backend without async host copies
            pass
        self._inflight.append((self._batch, any_act))
        return display, a, act

    def poll_done(self, lag: int = 2) -> bool:
        """True once a probe ≥`lag` batches old saw zero active pixels.
        The loop runs at most `lag` steps past convergence; those extra
        steps are no-ops for the output (every pixel is frozen), so the
        trajectory is unchanged — only the stop time moves. Use this in
        throughput loops; `done` stays for exact synchronous checks."""
        while self._inflight and self._inflight[0][0] <= self._batch - lag:
            _, v = self._inflight.popleft()
            if not bool(v):
                return True
        return False

    @property
    def done(self) -> bool:
        act = active_mask(self.state,
                          max_tolerance=self.cfg.adaptive.max_tolerance,
                          max_samples=self.cfg.adaptive.max_samples,
                          stats_mode=self.cfg.adaptive.stats_mode)
        return not bool(jnp.any(act))
