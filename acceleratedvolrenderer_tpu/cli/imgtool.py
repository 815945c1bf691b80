"""Image tool CLI — the `imgtool` equivalent.

Reference: src/pbrt/cmd/imgtool.cpp subcommands (:58-233): assemble,
average, cat, convert, diff (MSE/MRSE/L1 + FLIP), falsecolor, splitn,
whitebalance...  Implemented subset: diff, convert, falsecolor, average,
assemble, cat, info.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load(path):
    from ..utils.image import read_exr

    if path.endswith(".exr"):
        img, _, attrs = read_exr(path)
        return img[:, :, :3], attrs
    from PIL import Image

    arr = np.asarray(Image.open(path), np.float32) / 255.0
    return arr[:, :, :3], {}


def cmd_diff(args):
    from ..utils.flip import flip_mean
    from ..utils.image import mae, mrse, mse

    a, _ = _load(args.image)
    b, _ = _load(args.reference)
    if a.shape != b.shape:
        print(f"error: size mismatch {a.shape} vs {b.shape}", file=sys.stderr)
        return 1
    out = {
        "MSE": mse(a, b),
        "MRSE": mrse(a, b),
        "L1": mae(a, b),
        "FLIP": flip_mean(b, a),
    }
    print(json.dumps(out))
    if args.outfile:
        from ..utils.image import write_exr

        write_exr(args.outfile, np.abs(a - b))
    if args.metric and args.threshold is not None:
        return 0 if out[args.metric] <= args.threshold else 1
    return 0


def cmd_convert(args):
    img, attrs = _load(args.input)
    scale = args.scale
    img = img * scale
    if args.tonemap or args.output.endswith(".png"):
        from ..utils.image import write_png

        write_png(args.output, img)
    else:
        from ..utils.image import write_exr

        write_exr(args.output, img)
    print(f"wrote {args.output}")
    return 0


def cmd_falsecolor(args):
    img, _ = _load(args.input)
    lum = img @ np.array([0.2126, 0.7152, 0.0722])
    lo = lum.min() if args.minvalue is None else args.minvalue
    hi = lum.max() if args.maxvalue is None else args.maxvalue
    t = np.clip((lum - lo) / max(hi - lo, 1e-12), 0, 1)
    # viridis-ish 3-stop ramp
    stops = np.array([[0.267, 0.005, 0.329], [0.128, 0.567, 0.551], [0.993, 0.906, 0.144]])
    idx = t * 2.0
    i0 = np.clip(idx.astype(int), 0, 1)
    f = idx - i0
    rgb = stops[i0] * (1 - f[..., None]) + stops[i0 + 1] * f[..., None]
    from ..utils.image import write_png

    write_png(args.output, rgb, tonemap=False)
    print(f"wrote {args.output} (range {lo:.4g}..{hi:.4g})")
    return 0


def cmd_average(args):
    imgs = [(_load(p))[0] for p in args.inputs]
    avg = np.mean(np.stack(imgs), axis=0)
    from ..utils.image import write_exr

    write_exr(args.output, avg)
    print(f"wrote {args.output}")
    return 0


def cmd_assemble(args):
    """Assemble cropped renders into one image (imgtool assemble)."""
    from ..utils.image import read_exr, write_exr

    tiles = []
    for p in args.inputs:
        img, _, attrs = read_exr(p)
        tiles.append((img, attrs))
    H = max(t[1].get("fullHeight", t[0].shape[0]) for t in tiles)
    W = max(t[1].get("fullWidth", t[0].shape[1]) for t in tiles)
    out = np.zeros((H, W, tiles[0][0].shape[2]), np.float32)
    for img, attrs in tiles:
        y0 = attrs.get("cropY", 0)
        x0 = attrs.get("cropX", 0)
        out[y0: y0 + img.shape[0], x0: x0 + img.shape[1]] = img
    write_exr(args.output, out)
    print(f"wrote {args.output}")
    return 0


def cmd_info(args):
    img, attrs = _load(args.input)
    print(json.dumps({
        "resolution": [img.shape[1], img.shape[0]],
        "channels": img.shape[2],
        "min": float(img.min()), "max": float(img.max()),
        "mean": float(img.mean()),
        **{k: (v if isinstance(v, (int, float, str)) else str(v))
           for k, v in attrs.items() if k in
           ("renderTimeSeconds", "samplesPerPixel", "MSE")},
    }))
    return 0


def cmd_cat(args):
    img, _ = _load(args.input)
    np.set_printoptions(precision=4, suppress=True)
    print(img if args.all else img[:: max(img.shape[0] // 8, 1), :: max(img.shape[1] // 8, 1)])
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="avrt-imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diff", help="MSE/MRSE/L1 between two images")
    d.add_argument("image")
    d.add_argument("reference")
    d.add_argument("--outfile", default=None, help="write |a-b| EXR")
    d.add_argument("--metric", choices=["MSE", "MRSE", "L1", "FLIP"],
                   default=None)
    d.add_argument("--threshold", type=float, default=None)
    d.set_defaults(fn=cmd_diff)

    c = sub.add_parser("convert", help="EXR <-> PNG, scaling")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--scale", type=float, default=1.0)
    c.add_argument("--tonemap", action="store_true")
    c.set_defaults(fn=cmd_convert)

    f = sub.add_parser("falsecolor", help="luminance false-color PNG")
    f.add_argument("input")
    f.add_argument("output")
    f.add_argument("--minvalue", type=float, default=None)
    f.add_argument("--maxvalue", type=float, default=None)
    f.set_defaults(fn=cmd_falsecolor)

    a = sub.add_parser("average", help="average N images")
    a.add_argument("inputs", nargs="+")
    a.add_argument("--output", "-o", required=True)
    a.set_defaults(fn=cmd_average)

    asm = sub.add_parser("assemble", help="assemble crops into a full frame")
    asm.add_argument("inputs", nargs="+")
    asm.add_argument("--output", "-o", required=True)
    asm.set_defaults(fn=cmd_assemble)

    i = sub.add_parser("info", help="print image metadata")
    i.add_argument("input")
    i.set_defaults(fn=cmd_info)

    cat = sub.add_parser("cat", help="print pixel values")
    cat.add_argument("input")
    cat.add_argument("--all", action="store_true")
    cat.set_defaults(fn=cmd_cat)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
