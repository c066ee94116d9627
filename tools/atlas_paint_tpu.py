#!/usr/bin/env python
"""atlas_paint_tpu — authoring tool for the "Special RGBA Atlas" format.

The reference ships a Tk paint GUI (atlas_paint.py) for its raw-RGBA8
ASCII-texture format. This tool provides the same authoring capabilities on
top of ascii_renderer_tpu.atlas (the framework's IO/validator module):

  CLI subcommands (scriptable; work headless):
    new       create an empty atlas file
    info      validate + summarize (texel class histogram)
    stamp     place multiline ASCII art as glyph texels
    pixel     set a solid-color texel (A=1)
    char      set a glyph texel (A=ord)
    clear     clear a texel (A=0)
    preview   export a PNG preview (checkerboard/solids/glyphs/invalid-X)
    show      print the atlas as text (glyphs + # for solids)
  gui         Tk paint GUI (pencil / text / clear / stamp) — requires a
              display; headless environments use the CLI verbs.

Format spec: ascii_renderer_tpu/atlas/io.py (mirrors atlas_paint.py:5-66).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ascii_renderer_tpu.atlas.io import (  # noqa: E402
    AtlasImage, load_atlas, save_atlas, valid_mask,
)


def _load(args) -> AtlasImage:
    return AtlasImage.load(args.file, args.width, args.height)


def cmd_new(args):
    img = AtlasImage(args.width, args.height)
    img.save(args.file)
    print(f"created {args.file} ({args.width}x{args.height})")


def cmd_info(args):
    img = _load(args)
    a = img.arr[..., 3]
    n_clear = int((a == 0).sum())
    n_solid = int((a == 1).sum())
    n_glyph = int(((a >= 32) & (a <= 126)).sum())
    n_bad = int((~img.valid_mask()).sum())
    print(f"{args.file}: {img.width}x{img.height}  clear={n_clear} "
          f"solid={n_solid} glyph={n_glyph} invalid={n_bad}")
    if n_glyph:
        glyphs = sorted({chr(c) for c in np.unique(a) if 32 <= c <= 126})
        print("glyphs used:", "".join(glyphs))
    return 1 if n_bad else 0


def cmd_stamp(args):
    img = _load(args)
    art = open(args.art).read() if os.path.exists(args.art) else args.art
    img.stamp(args.x, args.y, art, rgb=tuple(args.rgb))
    img.save(args.file)
    print(f"stamped {len(art.splitlines())} rows at ({args.x},{args.y})")


def cmd_pixel(args):
    img = _load(args)
    img.set_pixel(args.x, args.y, tuple(args.rgb))
    img.save(args.file)


def cmd_char(args):
    img = _load(args)
    img.set_char(args.x, args.y, args.ch, tuple(args.rgb))
    img.save(args.file)


def cmd_clear(args):
    img = _load(args)
    img.clear(args.x, args.y)
    img.save(args.file)


def cmd_preview(args):
    img = _load(args)
    out = args.out or (os.path.splitext(args.file)[0] + "_preview.png")
    img.preview_image(scale=args.scale).save(out)
    print(f"wrote {out}")


def cmd_show(args):
    img = _load(args)
    a = img.arr[..., 3]
    for row in a:
        print("".join(chr(c) if 32 <= c <= 126 else
                      ("#" if c == 1 else ".") for c in row))


def cmd_gui(args):
    """Minimal Tk paint GUI: left-click paints (pencil/char mode), right
    click clears; keys: p=pencil, t=text (next key = glyph), s=save."""
    import tkinter as tk

    img = (AtlasImage.load(args.file, args.width, args.height)
           if os.path.exists(args.file) else AtlasImage(args.width, args.height))
    cell = args.scale
    root = tk.Tk()
    root.title(f"atlas_paint_tpu — {args.file}")
    cvs = tk.Canvas(root, width=img.width * cell, height=img.height * cell,
                    bg="#808080")
    cvs.pack()
    state = {"mode": "pencil", "char": "#", "rgb": (255, 255, 255)}

    def redraw():
        cvs.delete("all")
        for y in range(img.height):
            for x in range(img.width):
                r, g, b, a = (int(v) for v in img.arr[y, x])
                x0, y0 = x * cell, y * cell
                if a == 1:
                    cvs.create_rectangle(x0, y0, x0 + cell, y0 + cell,
                                         fill=f"#{r:02x}{g:02x}{b:02x}",
                                         outline="")
                elif 32 <= a <= 126:
                    cvs.create_text(x0 + cell // 2, y0 + cell // 2,
                                    text=chr(a),
                                    fill=f"#{r:02x}{g:02x}{b:02x}")
        for i in range(img.width + 1):
            cvs.create_line(i * cell, 0, i * cell, img.height * cell,
                            fill="#666")
        for i in range(img.height + 1):
            cvs.create_line(0, i * cell, img.width * cell, i * cell,
                            fill="#666")

    def paint(ev, clear=False):
        x, y = ev.x // cell, ev.y // cell
        if not (0 <= x < img.width and 0 <= y < img.height):
            return
        if clear:
            img.clear(x, y)
        elif state["mode"] == "pencil":
            img.set_pixel(x, y, state["rgb"])
        else:
            img.set_char(x, y, state["char"], state["rgb"])
        redraw()

    def key(ev):
        if ev.char == "p":
            state["mode"] = "pencil"
        elif ev.char == "t":
            state["mode"] = "text"
        elif ev.char == "s":
            img.save(args.file)
            root.title(f"atlas_paint_tpu — {args.file} [saved]")
        elif state["mode"] == "text" and ev.char and 32 <= ord(ev.char) <= 126:
            state["char"] = ev.char

    cvs.bind("<Button-1>", paint)
    cvs.bind("<B1-Motion>", paint)
    cvs.bind("<Button-3>", lambda e: paint(e, clear=True))
    root.bind("<Key>", key)
    redraw()
    root.mainloop()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="atlas_paint_tpu")
    p.add_argument("--width", "-W", type=int, default=32)
    p.add_argument("--height", "-H", type=int, default=32)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, *specs):
        sp = sub.add_parser(name)
        sp.add_argument("file")
        for spec in specs:
            sp.add_argument(*spec[0], **spec[1])
        sp.set_defaults(fn=fn)
        return sp

    add("new", cmd_new)
    add("info", cmd_info)
    add("stamp", cmd_stamp,
        (["x"], {"type": int}), (["y"], {"type": int}), (["art"], {}),
        (["--rgb"], {"type": int, "nargs": 3, "default": [255, 255, 255]}))
    add("pixel", cmd_pixel,
        (["x"], {"type": int}), (["y"], {"type": int}),
        (["--rgb"], {"type": int, "nargs": 3, "default": [255, 255, 255]}))
    add("char", cmd_char,
        (["x"], {"type": int}), (["y"], {"type": int}), (["ch"], {}),
        (["--rgb"], {"type": int, "nargs": 3, "default": [255, 255, 255]}))
    add("clear", cmd_clear, (["x"], {"type": int}), (["y"], {"type": int}))
    add("preview", cmd_preview, (["--out"], {"default": None}),
        (["--scale"], {"type": int, "default": 16}))
    add("show", cmd_show)
    add("gui", cmd_gui, (["--scale"], {"type": int, "default": 20}))

    args = p.parse_args(argv)
    return args.fn(args) or 0


if __name__ == "__main__":
    sys.exit(main())
