"""Calibration CLI — the reference's ``intrinsic_calib`` entry point
(``camera_model/src/intrinsic_calib.cc:29-56``), same flags:

    python -m vins_rgbd_fast_tpu.calib -w 8 --bh 12 -s 7.0 \\
        -i calibrationdata -p left- -e .png --camera-model pinhole

Reads ``{prefix}*{extension}`` grayscale PNGs from the input directory,
detects the chessboard in each, calibrates, prints per-view RMS, and
writes ``{camera_name}_camera_calib.yaml`` (camodocal layout, readable by
``config.load_config``).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="vins_rgbd_fast_tpu.calib")
    ap.add_argument("-w", "--width", type=int, default=8,
                    help="inner corners in x")
    ap.add_argument("--bh", "--board-height", dest="bheight", type=int,
                    default=12, help="inner corners in y")
    ap.add_argument("-s", "--size", type=float, default=7.0,
                    help="square size (mm)")
    ap.add_argument("-i", "--input", default="calibrationdata")
    ap.add_argument("-p", "--prefix", default="")
    ap.add_argument("-e", "--file-extension", dest="ext", default=".png")
    ap.add_argument("--camera-model", dest="model", default="mei",
                    choices=["pinhole", "kannala-brandt", "mei", "scaramuzza"])
    ap.add_argument("--camera-name", dest="name", default="camera")
    ap.add_argument("-v", "--verbose", action="store_true", default=True)
    args = ap.parse_args(argv)

    # offline tool, tiny problem sizes: run on CPU unless explicitly asked
    # (also keeps the CLI usable while a bench/training process holds the
    # TPU — the axon plugin admits one client at a time)
    import jax

    if os.environ.get("VINS_CALIB_TPU", "0") != "1":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    # refine() runs its LM in float64 — the normal equations mix fx²-scale
    # and 1e-4-scale entries and the damping floor (1e-12) is below f32
    # epsilon, so without x64 real runs can stall at the Zhang init
    jax.config.update("jax_enable_x64", True)

    from ..io.tum import _decode_png
    from .chessboard import find_chessboard
    from .calibrate import calibrate, write_camera_yaml

    if not os.path.isdir(args.input):
        print(f"# ERROR: Cannot find input directory {args.input}.",
              file=sys.stderr)
        return 1
    files = sorted(
        f for f in os.listdir(args.input)
        if f.startswith(args.prefix) and f.endswith(args.ext))
    views, used = [], []
    wh = None
    for f in files:
        img = _decode_png(os.path.join(args.input, f)).astype(np.float32)
        if img.ndim == 3:
            img = img.mean(axis=2)
        wh = (img.shape[1], img.shape[0])
        got = find_chessboard(img, rows=args.bheight, cols=args.width)
        if got is None:
            print(f"# INFO: no chessboard in {f}")
            continue
        views.append(got)
        used.append(f)
    if len(views) < 3:
        print(f"# ERROR: only {len(views)} usable views (need >= 3).",
              file=sys.stderr)
        return 1

    res = calibrate(args.model, views, rows=args.bheight, cols=args.width,
                    square=args.size, width=wh[0], height=wh[1])
    if args.verbose:
        for f, e in zip(used, res.per_view_rms_px):
            print(f"# INFO: {f}: rms = {e:.4f} px")
        print(f"# INFO: overall rms = {res.rms_px:.4f} px "
              f"({len(views)} views)")
        print(f"# INFO: {res.params}")
    out = f"{args.name}_camera_calib.yaml"
    write_camera_yaml(out, res, camera_name=args.name)
    print(f"# INFO: wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
