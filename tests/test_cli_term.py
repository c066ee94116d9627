"""Live terminal mode driven through a pty: mouse-look enable/parse,
dispatch-ahead loop, clean teardown (ref: pointer-lock mouse-look,
js/main.js:108-118; fbA/fbB double buffer, js/main.js:364-375)."""

import pytest

import os
import pty
import select
import subprocess
import sys
import time


@pytest.mark.slow
def test_term_mode_mouse_look_and_clean_exit():
    master, slave = pty.openpty()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "ascii_renderer_tpu.app.cli",
         "--mode", "term", "--backend", "raytrace",
         "--rows", "12", "--cols", "32", "--fps", "60"],
        stdin=slave, stdout=slave, stderr=subprocess.PIPE,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)))
    os.close(slave)
    out = b""
    try:
        deadline = time.time() + 120
        # wait until the loop is up (alt-screen + mouse enable emitted)
        while time.time() < deadline and b"\x1b[?1003h" not in out:
            r, _, _ = select.select([master], [], [], 1.0)
            if r:
                try:
                    out += os.read(master, 65536)
                except OSError:
                    break
        assert b"\x1b[?1003h" in out, "mouse tracking was not enabled"
        # SGR mouse motion (two positions -> a look delta), then quit
        os.write(master, b"\x1b[<35;10;5M")
        time.sleep(0.3)
        os.write(master, b"\x1b[<35;14;6M")
        time.sleep(0.5)
        os.write(master, b"q")
        # generous: a loaded machine (parallel compiles) can stall the
        # frame loop long past a human-scale deadline
        deadline = time.time() + 120
        while proc.poll() is None and time.time() < deadline:
            r, _, _ = select.select([master], [], [], 0.2)
            if r:
                try:
                    out += os.read(master, 65536)
                except OSError:
                    break
        # drain any remainder
        while True:
            r, _, _ = select.select([master], [], [], 0.2)
            if not r:
                break
            try:
                chunk = os.read(master, 65536)
            except OSError:
                break
            if not chunk:
                break
            out += chunk
    finally:
        os.close(master)
        try:
            proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
    stderr = proc.stderr.read().decode()
    assert proc.returncode == 0, f"rc={proc.returncode}\n{stderr[-2000:]}"
    # teardown restored the terminal: mouse + alt screen disabled
    assert b"\x1b[?1003l" in out
    assert b"\x1b[?1049l" in out
    assert "[termblit" in stderr


def test_measure_terminal_pixel_aspect_fake_ioctl(monkeypatch):
    """TIOCGWINSZ-derived cell aspect (VERDICT r4 item 5): pixel sizes
    reported -> cw/ch; zeros (common) or ioctl failure -> fallback."""
    import struct
    import fcntl
    from ascii_renderer_tpu.app import cli

    def fake_ioctl(packed):
        def _ioctl(fd, req, buf):
            import termios
            assert req == termios.TIOCGWINSZ
            return packed
        return _ioctl

    # 40 rows x 100 cols, 800x1000 px -> cell 8x25 -> aspect 0.32
    monkeypatch.setattr(fcntl, "ioctl",
                        fake_ioctl(struct.pack("HHHH", 40, 100, 800, 1000)))
    got = cli.measure_terminal_pixel_aspect(fd=0)
    assert abs(got - 0.32) < 1e-9

    # terminal reports no pixel sizes -> fallback
    monkeypatch.setattr(fcntl, "ioctl",
                        fake_ioctl(struct.pack("HHHH", 40, 100, 0, 0)))
    assert cli.measure_terminal_pixel_aspect(fd=0, fallback=0.5) == 0.5

    # ioctl raises (not a tty) -> fallback
    def raising(fd, req, buf):
        raise OSError(25, "not a tty")
    monkeypatch.setattr(fcntl, "ioctl", raising)
    assert cli.measure_terminal_pixel_aspect(fd=0, fallback=0.44) == 0.44

    # absurd ratios are rejected (a wrong winsize must not distort)
    monkeypatch.setattr(fcntl, "ioctl",
                        fake_ioctl(struct.pack("HHHH", 1, 1000, 4, 1000)))
    assert cli.measure_terminal_pixel_aspect(fd=0, fallback=0.5) == 0.5


# ---------------------------------------------------------------------------
# TermInput state machine (no TTY needed): parsing + the selection pause
# (the reference's leave-pointer-lock-to-copy UX, js/text_overlay.js:188-238)
# ---------------------------------------------------------------------------
from ascii_renderer_tpu.app.terminput import TermInput  # noqa: E402


def test_terminput_keys_and_arrows():
    ti = TermInput()
    ti.feed(b"w d")
    ti.feed(b"\x1b[A\x1b[D")
    assert ti.keys == {"w", "d", " ", "arrowup", "arrowleft"}
    assert not ti.quit and not ti.paused
    ti.reset_frame()
    assert ti.keys == set() and ti.mdx == 0.0


def test_terminput_mouse_look_and_click():
    ti = TermInput(mouse_scale=8.0)
    ti.feed(b"\x1b[<35;10;5M")   # motion -> anchor
    ti.feed(b"\x1b[<35;14;6M")   # motion -> delta (4, 1) cells
    assert ti.mdx == 4 * 8.0 and ti.mdy == 1 * 8.0
    ti.feed(b"\x1b[<0;3;2M")     # left press -> click at 0-based (2, 1)
    assert (2, 1) in ti.clicks


def test_terminput_quit():
    ti = TermInput()
    ti.feed(b"q")
    assert ti.quit
    ti2 = TermInput()
    ti2.feed(b"\x03")
    assert ti2.quit


def test_terminput_selection_pause_cycle():
    """p pauses (transition emitted once), mouse reports while paused are
    ignored, any key resumes and is CONSUMED (no quit, no movement), and
    the mouse anchor resets so resume doesn't jerk the camera."""
    ti = TermInput(mouse_scale=8.0)
    ti.feed(b"\x1b[<35;10;5M")  # set an anchor pre-pause
    ti.feed(b"p")
    assert ti.paused and ti.transitions == ["pause"]
    ti.feed(b"\x1b[<35;20;9M")  # late mouse report: ignored
    assert ti.mdx == 0.0 and ti.mdy == 0.0
    ti.feed(b"q")  # wake key: resumes, does NOT quit
    assert not ti.paused and not ti.quit
    assert ti.transitions == ["pause", "resume"]
    ti.feed(b"\x1b[<35;30;9M")  # first post-resume report only re-anchors
    assert ti.mdx == 0.0 and ti.mdy == 0.0
    ti.feed(b"\x1b[<35;31;9M")
    assert ti.mdx == 8.0
    # the consumed wake key left no movement behind
    assert ti.keys == set()


def test_terminput_pause_resume_within_one_frame():
    ti = TermInput()
    ti.feed(b"p" + b"x")
    assert not ti.paused
    assert ti.transitions == ["pause", "resume"]


def test_terminput_malformed_csi_resyncs():
    ti = TermInput()
    ti.feed(b"\x1b[<garbage-that-never-terminates-000")
    ti.feed(b"w")
    assert "w" in ti.keys
