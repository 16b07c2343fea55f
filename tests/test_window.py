"""Display-window counterpart tests (≙ border-atari-env's winit/pixels
window, border-atari-env/src/env/window.rs:1-67): terminal renderer +
PNG/GIF frame capture."""

import io

import numpy as np
import pytest

from border_tpu.utils import FrameRecorder, TerminalWindow


def test_terminal_window_renders_ansi_halfblocks():
    buf = io.StringIO()
    win = TerminalWindow(fps=1e9, max_width=32, out=buf)
    frame = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    win.show(frame)
    out = buf.getvalue()
    assert "▀" in out
    assert "\x1b[38;5;" in out  # fg gray ramp
    # stacked obs input: newest channel is rendered
    win.show(np.stack([frame, 255 - frame], axis=-1))
    assert buf.getvalue().count("▀") > out.count("▀")


def test_terminal_window_throttles():
    buf = io.StringIO()
    win = TerminalWindow(fps=1e-9, out=buf)  # ~never redraws after first
    f = np.zeros((8, 8), np.uint8)
    win.show(f)
    first = buf.getvalue()
    win.show(f)
    assert buf.getvalue() == first


def test_frame_recorder_pngs(tmp_path):
    rec = FrameRecorder(out_dir=str(tmp_path), every=2)
    for i in range(6):
        rec.add(np.full((16, 16), i * 40, np.uint8))
    assert len(rec) == 3
    pngs = sorted(tmp_path.glob("frame_*.png"))
    assert len(pngs) == 3
    assert pngs[0].read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_gif_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(0)
    # large frames force LZW table resets; constants hit the short-code path
    frames = [rng.randint(0, 256, (210, 160), np.uint8) for _ in range(3)]
    frames += [np.full((210, 160), 128, np.uint8)]
    rec = FrameRecorder()
    for f in frames:
        rec.add(f)
    path = rec.save_gif(str(tmp_path / "out.gif"), fps=30)
    im = PIL.open(path)
    assert im.n_frames == len(frames)
    for i, f in enumerate(frames):
        im.seek(i)
        assert np.array_equal(np.asarray(im.convert("L")), f)
