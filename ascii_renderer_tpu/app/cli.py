"""CLI app shell (ref: js/main.js + index.html).

CLI flags replace the reference's URL query params (?backend=, ?debug —
js/main.js:65-70,174-180); stdout replaces the DOM/canvas. Three modes:

  offline     render N frames, print (or save) the glyph text
  interactive curses-style live loop with WASD/arrow keys (TTY required)
  image       render one frame and save the glyph-expanded PNG

The frame pipeline is the fused device program from sim/framestep; this
shell only handles IO, timing (the TARGET_FPS gate, js/main.js:395-397)
and input plumbing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ascii_renderer_tpu.core.config import Config, PathTracerConfig
from ascii_renderer_tpu.core.camera import CameraInputs
from ascii_renderer_tpu.ascii.text import chars_to_strings
from ascii_renderer_tpu.sim.framestep import demo_setup


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ascii-renderer-tpu",
        description="TPU-native ASCII renderer (pathtrace | raytrace | raster)")
    p.add_argument("--backend", "-b", default=None,
                   help="pathtrace|raytrace|raster (aliases pt/rt/r)")
    p.add_argument("--frames", "-n", type=int, default=1)
    p.add_argument("--batch", type=int, default=0,
                   help="offline mode: render N frames per device dispatch "
                        "(lax.scan batching; amortizes host overhead)")
    p.add_argument("--cols", type=int, default=None)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--spp", type=int, default=None, help="path tracer samples")
    p.add_argument("--ramp", default=None)
    p.add_argument("--no-modal", action="store_true",
                   help="disable the modal glyph filter")
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="also dump the raw RGB cell grid stats (the ?debug "
                        "preview analog)")
    p.add_argument("--mode",
                   choices=["offline", "interactive", "image", "term",
                            "pixels"],
                   default="offline")
    p.add_argument("--progressive", action="store_true",
                   help="progressive path tracing: accumulate sample "
                        "batches across frames while the camera is still "
                        "(the reference's dormant adaptive pipeline, "
                        "js/render/renderer.js:101-210, revived)")
    p.add_argument("--out", default=None, help="output file (text or png)")
    p.add_argument("--pixel-aspect", type=_positive_float, default=None,
                   help="character cell width/height ratio (> 0); default: "
                        "measured from the terminal in --mode term "
                        "(TIOCGWINSZ), else the config default (0.5)")
    p.add_argument("--cell", default=None, metavar="WxH",
                   help="--mode image/pixels: glyph cell size in device "
                        "pixels, e.g. 16x32 — bakes a fresh glyph atlas at "
                        "that size (the reference bakes at the live page's "
                        "device-pixel cell size, js/ascii_pass.js:20-86,"
                        "304-326); default: the cached 8x16 asset")
    p.add_argument("--font", default=None, metavar="PATH",
                   help="--mode image/pixels: TTF font file for --cell "
                        "baking (default: DejaVuSansMono)")
    p.add_argument("--fps", type=float, default=None, help="target fps cap")
    p.add_argument("--scene", default=None,
                   help="unified-schema scene JSON to render instead of the "
                        "demo scene (see utils/checkpoint.save_scene_json)")
    p.add_argument("--atlas", default=None, metavar="FILE:WxH",
                   help="attach a raw ASCII-texture atlas, e.g. art.bin:32x32")
    return p


_ALIASES = {"pt": "pathtrace", "rt": "raytrace", "r": "raster",
            "path": "pathtrace", "ray": "raytrace", "rasterizer": "raster"}


def _positive_float(s: str) -> float:
    """argparse type: a strictly positive float. Rejects 0 (which a
    truthiness gate would silently ignore) and negatives (which would
    mirror-flip the image via a negative NDC aspect)."""
    v = float(s)
    if not v > 0:
        raise argparse.ArgumentTypeError(f"must be > 0, got {s}")
    return v


def _glyph_atlas_from_args(args):
    """--cell WxH [--font PATH] -> freshly baked glyph atlas (None = the
    cached 8x16 asset). The reference bakes its atlas from the live page
    font at device-pixel cell size every session (js/ascii_pass.js:20-86)."""
    if not getattr(args, "cell", None):
        return None
    try:
        w, h = (int(v) for v in args.cell.lower().split("x"))
        if w <= 0 or h <= 0:
            raise ValueError
    except ValueError:
        raise SystemExit(f'error: --cell expects WxH, got "{args.cell}"')
    from ascii_renderer_tpu.ascii.glyphs import bake_glyph_atlas
    return bake_glyph_atlas(w, h, font_path=getattr(args, "font", None))


def config_from_args(args) -> Config:
    cfg = Config()
    kw = {}
    if args.cols:
        kw["grid_width"] = args.cols
    if args.rows:
        kw["grid_height"] = args.rows
    if args.ramp:
        kw["ascii_ramp"] = args.ramp
    if args.no_modal:
        kw["ascii_mode_filter"] = False
    if args.grayscale:
        kw["use_grayscale"] = True
    if args.fps:
        kw["target_fps"] = int(args.fps)
    if args.backend:
        kw["default_backend"] = _ALIASES.get(args.backend, args.backend)
    if args.spp:
        kw["path_tracer"] = PathTracerConfig(samples_per_batch=args.spp)
    pa = getattr(args, "pixel_aspect", None)
    if pa is not None:  # `is not None`, not truthiness: 0 must error via
        kw["pixel_aspect"] = pa  # the argparse type, never be ignored
    return cfg.replace(**kw) if kw else cfg


def measure_terminal_pixel_aspect(fd=None, fallback: float = 0.5) -> float:
    """Measured character-cell aspect (width/height) of the attached
    terminal via TIOCGWINSZ's ws_xpixel/ws_ypixel — the reference
    measures a live DOM glyph for the same purpose (js/main.js:166-171,
    217: PIXEL_ASPECT feeds every backend's camera mapping; without the
    measurement, circles render as ellipses on any font that isn't
    exactly 1:2). Terminals that don't report pixel sizes (xpixel/ypixel
    of 0 is common) fall back to `fallback`."""
    import fcntl
    import struct
    import termios
    try:
        if fd is None:
            fd = sys.stdout.fileno()
        buf = fcntl.ioctl(fd, termios.TIOCGWINSZ, b"\0" * 8)
        rows_, cols_, xpx, ypx = struct.unpack("HHHH", buf)
        if rows_ > 0 and cols_ > 0 and xpx > 0 and ypx > 0:
            cw = xpx / cols_
            ch = ypx / rows_
            if ch > 0 and 0.1 <= cw / ch <= 2.0:  # sanity bounds
                return cw / ch
    except (OSError, ValueError):
        pass
    return fallback



def _builder_from_args(args):
    """--scene / --atlas -> SceneBuilder override (None = demo scene).

    The raytrace backend gets the LIT demo fixture by default: the path
    tracer's demo scene lights the room with emissive quads, which the
    (reference-faithful) Whitted tracer does not treat as lights — on that
    scene it renders a pitch-black room, exactly like the reference's
    raytrace shader on its default scene. A black screen is a useless
    default, so the rt fixture (same room, explicit point/dir lights) is
    substituted unless the user names a scene."""
    if not args.scene and not args.atlas:
        if getattr(args, "backend", None) in ("rt", "ray", "raytrace"):
            from ascii_renderer_tpu.scene.demo import create_rt_demo_scene
            return create_rt_demo_scene()
        return None
    if args.scene:
        from ascii_renderer_tpu.utils.checkpoint import load_scene_json
        sb = load_scene_json(args.scene)
    else:
        from ascii_renderer_tpu.scene.demo import create_demo_scene
        sb = create_demo_scene()
    if args.atlas:
        try:
            path, dims = args.atlas.rsplit(":", 1)
            w, h = (int(v) for v in dims.lower().split("x"))
        except ValueError:
            raise SystemExit(f'error: --atlas expects FILE:WxH, got "{args.atlas}"')
        from ascii_renderer_tpu.atlas.io import load_atlas
        sb.set_atlas(load_atlas(path, w, h))
    return sb


def run_offline(args) -> int:
    cfg = config_from_args(args)
    batch = max(0, args.batch)
    cfg, scene, state, step = demo_setup(cfg, builder=_builder_from_args(args),
                                         batch=batch)
    ins = CameraInputs.from_keys(())
    fps_val = float(cfg.target_fps)
    t_frame = 0.0
    frame = None
    if batch > 1:
        # N frames per device dispatch (SURVEY §7 multi-frame batching)
        import jax.numpy as jnp
        from ascii_renderer_tpu.sim.framestep import broadcast_inputs
        ins_n = broadcast_inputs(ins, batch)
        dt_n = jnp.full((batch,), 1.0 / 60.0, jnp.float32)
        for _ in range(-(-args.frames // batch)):
            t0 = time.perf_counter()
            state, chars_n, _tint_n = step(scene, state, ins_n, dt_n, fps_val)
            chars_n.block_until_ready()
            t_frame = (time.perf_counter() - t0) / batch
            fps_val = 1.0 / max(t_frame, 1e-6)
        chars = chars_n[-1]
    else:
        for i in range(args.frames):
            t0 = time.perf_counter()
            state, chars, _tint, frame = step(scene, state, ins, 1.0 / 60.0,
                                              fps_val)
            chars.block_until_ready()
            t_frame = time.perf_counter() - t0
            fps_val = 1.0 / max(t_frame, 1e-6)
    rows = chars_to_strings(chars)
    text = "\n".join(rows)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.out} ({len(rows)}x{len(rows[0])} glyphs, "
              f"last frame {t_frame*1000:.1f} ms)")
    else:
        print(text)
    if args.debug and frame is not None:
        rgb = np.asarray(frame.rgb)
        print(f"[debug] cell grid {rgb.shape} mean={rgb.mean():.1f} "
              f"max={rgb.max()} overrides={int(((np.asarray(frame.a)>=2)&(np.asarray(frame.a)<=254)).sum())}",
              file=sys.stderr)
    return 0


def run_progressive(args) -> int:
    """Progressive path-traced refinement in the app shell (VERDICT r2:
    the revived adaptive/accumulation capability, SURVEY §2 row 21, was
    library-only — the exact 'dead code' failure mode the reference had).

    Accumulates one spp batch per step via ProgressivePathTracer (Welford
    stats, 95% CI convergence, camera-move reset), stopping when every
    pixel converged or --frames batches ran. --debug prints per-step
    converged-pixel percentages (the adaptive mask readout)."""
    import jax.numpy as jnp

    cfg = config_from_args(args)
    sb = _builder_from_args(args)
    if sb is None:
        from ascii_renderer_tpu.scene.demo import create_demo_scene
        from ascii_renderer_tpu.atlas.io import demo_atlas
        sb = create_demo_scene()
        sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    from ascii_renderer_tpu.sim.accum import ProgressivePathTracer
    from ascii_renderer_tpu.core.frame import Frame
    from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide

    tracer = ProgressivePathTracer(cfg, scene)
    n_max = args.frames if args.frames > 1 else cfg.adaptive.max_samples
    display = act = a = None
    t0 = time.perf_counter()
    for i in range(n_max):
        display, a, act = tracer.step(scene.camera)
        if args.debug:
            # --debug reads the mask back each batch (a sync round trip);
            # the quiet path below stays fully pipelined
            conv = 100.0 * (1.0 - float(np.asarray(act).mean()))
            print(f"[progressive] batch {i + 1}: {conv:.1f}% converged",
                  file=sys.stderr)
            if tracer.done:
                break
        elif tracer.poll_done():
            # lagged async probe: no tunnel RTT, no dispatch-queue drain
            # per batch (costs at most `lag` extra no-op batches)
            break
    dt = time.perf_counter() - t0
    frame = Frame.from_float(display, a)
    chars, _tint = glyph_decide(
        frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
        mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
        grayscale=cfg.use_grayscale)
    text = "\n".join(chars_to_strings(chars))
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    conv = 100.0 * (1.0 - float(np.asarray(act).mean()))
    spb = cfg.path_tracer.samples_per_batch
    print(f"[progressive] {i + 1} batches x {spb} spp in {dt:.2f}s, "
          f"{conv:.1f}% of pixels converged "
          f"(tol {cfg.adaptive.max_tolerance:.0%}, "
          f"cap {cfg.adaptive.max_samples} batches)", file=sys.stderr)
    return 0


def run_pixels(args) -> int:
    """Frame-rate glyph-BITMAP presentation: the reference draws the
    full-resolution glyph canvas every frame (js/ascii_pass.js:257-302);
    this mode drives the same capability in a loop — render -> glyph
    decision -> on-device pixel expansion -> raw RGB24 frame stream to
    --out (default frames.rgb), with the rate measured. Dispatch-ahead
    double buffering keeps the readback off the critical path."""
    cfg = config_from_args(args)
    cfg, scene, state, step = demo_setup(cfg,
                                         builder=_builder_from_args(args))
    from ascii_renderer_tpu.ascii.ascii_pass import AsciiPass

    p = AsciiPass(cfg, glyph_atlas=_glyph_atlas_from_args(args))
    ins = CameraInputs.from_keys(())
    fps_val = float(cfg.target_fps)
    out_path = args.out or "frames.rgb"
    n = max(1, args.frames)
    pending = None
    wrote = 0
    # warm-up: trace + compile the step and the expansion outside the timed
    # loop (otherwise --frames=1 reports seconds of pure compile time as
    # the frame rate); the warm-up frame is discarded, state is unchanged
    _s, _c, _t, _f = step(scene, state, ins, 0.0, fps_val)
    np.asarray(p._expand(_c, _t, p.atlas))
    t0 = time.perf_counter()
    with open(out_path, "wb") as f:
        for _ in range(n):
            state, chars, tint, _frame = step(scene, state, ins, 1.0 / 60.0,
                                              fps_val)
            px = p._expand(chars, tint, p.atlas)
            if pending is not None:
                f.write(np.asarray(pending).tobytes())
                wrote += 1
            pending = px
            fps_val = wrote / max(time.perf_counter() - t0, 1e-6)
        f.write(np.asarray(pending).tobytes())
        wrote += 1
    dt = (time.perf_counter() - t0) / n
    h, w = int(pending.shape[0]), int(pending.shape[1])
    nc = int(pending.shape[2])
    print(f"wrote {wrote} raw frames ({w}x{h} px, {nc} ch) to {out_path} "
          f"at {1.0 / dt:.1f} FPS (cell grid {cfg.grid_width}x"
          f"{cfg.grid_height})")
    return 0


def run_image(args) -> int:
    cfg = config_from_args(args)
    cfg, scene, state, step = demo_setup(cfg, builder=_builder_from_args(args))
    ins = CameraInputs.from_keys(())
    state, chars, tint, _frame = step(scene, state, ins, 1.0 / 60.0,
                                      float(cfg.target_fps))
    from ascii_renderer_tpu.ascii.ascii_pass import AsciiPass
    p = AsciiPass(cfg, glyph_atlas=_glyph_atlas_from_args(args))
    img = np.asarray(p._expand(chars, tint, p.atlas))
    out = args.out or "frame.png"
    from PIL import Image
    Image.fromarray(img).save(out)
    print(f"wrote {out} ({img.shape[1]}x{img.shape[0]} px)")
    return 0


def run_interactive(args) -> int:
    """Live terminal loop: WASD move, arrows look, q quits
    (the pointer-lock/keyboard UX of js/main.js:84-135, terminal-ized)."""
    import curses

    cfg = config_from_args(args)
    cfg, scene, state, step = demo_setup(cfg, builder=_builder_from_args(args))

    def loop(scr):
        nonlocal state
        curses.curs_set(0)
        scr.nodelay(True)
        frame_interval = 1.0 / cfg.target_fps
        fps_val = float(cfg.target_fps)
        pending = None  # frame in flight (dispatch-ahead double buffer)
        last = time.perf_counter()
        keymap = {ord("w"): "w", ord("a"): "a", ord("s"): "s", ord("d"): "d",
                  ord(" "): " ", curses.KEY_UP: "arrowup",
                  curses.KEY_DOWN: "arrowdown", curses.KEY_LEFT: "arrowleft",
                  curses.KEY_RIGHT: "arrowright"}
        while True:
            now = time.perf_counter()
            dt = now - last
            if dt < frame_interval:  # TARGET_FPS gate
                time.sleep(frame_interval - dt)
                continue
            last = now
            keys = set()
            while True:
                ch = scr.getch()
                if ch == -1:
                    break
                if ch in (ord("q"), 27):
                    return
                if ch == ord("c"):  # click -> ripple at grid center
                    state = state.add_ripple(cfg.grid_width // 2,
                                             cfg.grid_height // 2)
                k = keymap.get(ch)
                if k:
                    keys.add(k)
            ins = CameraInputs.from_keys(keys)
            # dispatch-ahead pipelining (the fbA/fbB double buffer,
            # js/main.js:364-375,406-409): kick frame N, then display
            # frame N-1 while N renders — readback leaves the critical path
            state, chars, _tint, _f = step(scene, state, ins, dt, fps_val)
            if pending is not None:
                rows = chars_to_strings(pending)
                maxy, maxx = scr.getmaxyx()
                for y, row in enumerate(rows[: maxy - 1]):
                    scr.addnstr(y, 0, row, maxx - 1)
                scr.refresh()
            pending = chars
            fps_val = 1.0 / max(time.perf_counter() - now, 1e-6)

    curses.wrapper(loop)
    return 0


_KNOWN_BACKENDS = ("pathtrace", "raytrace", "raster")


def run_term(args) -> int:
    """Raw-ANSI 24-bit color loop via the native termblit encoder: WASD
    move, arrows look, p pauses for text selection, q quits. Uses the
    alternate screen buffer.

    Selection pause (the reference's leave-pointer-lock-to-copy UX,
    js/text_overlay.js:188-238): press ``p`` — the frame freezes and
    mouse reporting turns OFF, so the terminal's native click-drag
    selection and copy work on the frozen glyphs; press any key to
    resume (the keypress is consumed)."""
    import select
    import termios
    import tty

    from ascii_renderer_tpu.app.termblit import TermBlitter
    from ascii_renderer_tpu.app.terminput import TermInput
    from ascii_renderer_tpu.utils.profiling import FrameStats

    if not sys.stdin.isatty() or not sys.stdout.isatty():
        print("error: --mode term needs an interactive terminal "
              "(use --mode offline for piped output)", file=sys.stderr)
        return 2

    cfg = config_from_args(args)
    if args.pixel_aspect is None:
        # measure the real cell aspect (reference: js/main.js:166-171)
        cfg = cfg.replace(pixel_aspect=measure_terminal_pixel_aspect(
            fallback=cfg.pixel_aspect))
    cfg, scene, state, step = demo_setup(cfg, builder=_builder_from_args(args))
    tb = TermBlitter(cfg.grid_height, cfg.grid_width,
                     color=not cfg.use_grayscale)
    stats = FrameStats()
    frame_interval = 1.0 / cfg.target_fps

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    out = sys.stdout.buffer
    # mouse-look: a terminal cell is several device pixels tall/wide; scale
    # cell deltas so sensitivity feels like the reference's pixel deltas
    MOUSE_SCALE = 8.0
    try:
        tty.setcbreak(fd)
        # alt screen, hide cursor, any-event mouse tracking (xterm 1003)
        # with SGR coordinates (1006) -> pointer-look, js/main.js:108-118
        out.write(b"\x1b[?1049h\x1b[?25l\x1b[2J\x1b[?1003h\x1b[?1006h")
        out.flush()
        ti = TermInput(mouse_scale=MOUSE_SCALE)
        last = time.perf_counter()
        pending = None  # frame in flight (dispatch-ahead double buffer)
        while True:
            now = time.perf_counter()
            dt = now - last
            if dt < frame_interval:
                time.sleep(frame_interval - dt)
                continue
            last = now
            ti.reset_frame()
            while select.select([fd], [], [], 0)[0]:
                ti.feed(os.read(fd, 64))
            if ti.quit:
                return 0
            for cx, cy in ti.clicks:
                state = state.add_ripple(cx, cy)
            for tr in ti.transitions:
                if tr == "pause":  # free the terminal's native selection
                    out.write(b"\x1b[?1006l\x1b[?1003l")
                else:  # resume: restore mouse-look reporting
                    out.write(b"\x1b[?1003h\x1b[?1006h")
                out.flush()
            if ti.paused:  # frozen frame; nothing to render or draw
                time.sleep(0.05)
                continue
            ins = CameraInputs.from_keys(ti.keys, mouse_dx=ti.mdx,
                                         mouse_dy=ti.mdy)
            # dispatch-ahead pipelining (fbA/fbB, js/main.js:364-375):
            # kick frame N, then materialize + display frame N-1 while N
            # renders — loop FPS tracks device FPS, not device + readback
            state, chars, tint, _f = step(scene, state, ins, dt, stats.fps)
            if pending is not None:
                pc, pt = pending
                out.write(tb.encode(np.asarray(pc), np.asarray(pt)))
                out.flush()
            pending = (chars, tint)
            stats.tick()
    finally:
        out.write(b"\x1b[?1006l\x1b[?1003l\x1b[0m\x1b[?25h\x1b[?1049l")
        out.flush()
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        print(f"[termblit native={tb.native}] {stats.summary()}",
              file=sys.stderr)
    return 0


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS even when a site plugin's registration hook
    # would otherwise re-route backend selection (the env var is read
    # once at jax import; the config knob wins at backends() time, so a
    # user's JAX_PLATFORMS=cpu reliably keeps the app off an
    # unavailable accelerator tunnel).
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    args = build_parser().parse_args(argv)
    if args.backend:
        resolved = _ALIASES.get(args.backend, args.backend)
        if resolved not in _KNOWN_BACKENDS:
            print(f'error: unknown backend "{args.backend}". '
                  f'Known: {", ".join(_KNOWN_BACKENDS)} '
                  f'(aliases: {", ".join(_ALIASES)})', file=sys.stderr)
            return 2
    if args.mode == "interactive":
        return run_interactive(args)
    if args.mode == "term":
        return run_term(args)
    if args.mode == "image":
        return run_image(args)
    if args.mode == "pixels":
        return run_pixels(args)
    if args.progressive:
        return run_progressive(args)
    return run_offline(args)


if __name__ == "__main__":
    sys.exit(main())
