"""Assemble exported frame PNGs into a video (or animated GIF fallback).

Counterpart of the reference's make_video.py (imageio.mimsave over sorted
frame PNGs). Uses ffmpeg/imageio when present; otherwise writes an animated
GIF with a dependency-free encoder so the pipeline works in any environment.
"""
from __future__ import annotations

import argparse
import os
import shutil
import struct
import subprocess


def collect_frames(input_dir: str, image_name: str = "raw_view.png"):
    frames = []
    for d in sorted(os.listdir(input_dir)):
        p = os.path.join(input_dir, d, image_name)
        if os.path.isfile(p):
            frames.append(p)
    return frames


def _read_png_rgb(path):
    import zlib
    import numpy as np
    with open(path, "rb") as f:
        data = f.read()
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", chunk[:8])
        elif tag == b"IDAT":
            idat += chunk
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    img = np.frombuffer(raw, np.uint8).reshape(h, stride)
    assert (img[:, 0] == 0).all(), "only filter-0 PNGs supported"
    return img[:, 1:].reshape(h, w, 3)


def write_gif(frames, out_path, fps):
    """Minimal animated GIF (global 216-color web-safe palette)."""
    import numpy as np
    imgs = [_read_png_rgb(f) for f in frames]
    h, w, _ = imgs[0].shape
    delay = max(2, int(100 / fps))
    with open(out_path, "wb") as f:
        f.write(b"GIF89a")
        f.write(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
        pal = bytearray()
        for r in range(6):
            for g in range(6):
                for b in range(6):
                    pal += bytes((r * 51, g * 51, b * 51))
        pal += bytes(3 * (256 - 216))
        f.write(bytes(pal))
        f.write(b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00")
        for img in imgs:
            q = (img.astype(np.uint16) + 25) // 51
            idx = (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.uint8)
            f.write(b"\x21\xF9\x04\x04" + struct.pack("<H", delay) + b"\x00\x00")
            f.write(b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
            # uncompressed LZW (clear code before every symbol)
            f.write(bytes([8]))
            data = bytearray()
            bitbuf, nbits = 0, 0
            def put(code, width, data=data):
                nonlocal bitbuf, nbits
                bitbuf |= code << nbits
                nbits += width
                while nbits >= 8:
                    data.append(bitbuf & 0xFF)
                    bitbuf >>= 8
                    nbits -= 8
            for px in idx.ravel():
                put(256, 9)          # clear
                put(int(px), 9)
            put(257, 9)              # end
            if nbits:
                data.append(bitbuf & 0xFF)
            for i in range(0, len(data), 255):
                blk = data[i:i + 255]
                f.write(bytes([len(blk)]) + bytes(blk))
            f.write(b"\x00")
        f.write(b"\x3B")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--image_name", default="raw_view.png")
    ap.add_argument("--output", default=None)
    ap.add_argument("--fps", type=int, default=30)
    args = ap.parse_args()

    frames = collect_frames(args.input_dir, args.image_name)
    if not frames:
        raise SystemExit(f"no {args.image_name} frames under {args.input_dir}")
    out = args.output

    if shutil.which("ffmpeg"):
        out = out or os.path.join(args.input_dir, "video.mp4")
        listfile = os.path.join(args.input_dir, "_frames.txt")
        with open(listfile, "w") as f:
            for fr in frames:
                f.write(f"file '{os.path.abspath(fr)}'\nduration {1.0 / args.fps}\n")
        subprocess.run(["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i",
                        listfile, "-pix_fmt", "yuv420p", out], check=True)
        os.remove(listfile)
    else:
        try:
            import imageio
            out = out or os.path.join(args.input_dir, "video.mp4")
            imageio.mimsave(out, [imageio.imread(f) for f in frames],
                            fps=args.fps)
        except Exception:
            out = out or os.path.join(args.input_dir, "video.gif")
            write_gif(frames, out, args.fps)
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
