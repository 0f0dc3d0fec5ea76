"""Unique detection points with probability values from a probability image.

Reference analog: biapy/utils/scripts/create_probability_csv.py — local-maxima
extraction above a threshold, radius-based duplicate removal (anisotropic voxel
size respected), CSV with the peak probability per point.

Usage:
    python -m biapy_tpu.utils.scripts.create_probability_csv \
        --input probs/ --output csvs/ --threshold 0.3 --radius 10 \
        --resolution 1 1 2 [--is_3d]
"""

import argparse
import csv
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="probability image or directory")
    p.add_argument("--output", required=True, help="output CSV directory")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--radius", type=float, default=0.0,
                   help="drop points closer than this (physical units)")
    p.add_argument("--resolution", type=float, nargs="+", default=None,
                   help="voxel size per axis for the radius metric")
    p.add_argument("--min_distance", type=int, default=1)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.data.post_processing import peak_local_max, remove_close_points

    files = list_image_files(args.input) if os.path.isdir(args.input) else [args.input]
    os.makedirs(args.output, exist_ok=True)
    for f in files:
        prob = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.float32)
        pts = peak_local_max(prob, min_distance=args.min_distance,
                             threshold_abs=args.threshold)
        if args.radius > 0 and len(pts):
            res = tuple(args.resolution) if args.resolution else (1.0,) * prob.ndim
            # highest-probability point wins a conflict: greedy keep in
            # descending-prob order (reference keeps first in list order;
            # prob order is strictly better and deterministic)
            order = np.argsort(-prob[tuple(pts.T)])
            pts = remove_close_points(pts[order], args.radius, resolution=res)
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.output, base + "_prob.csv")
        with open(out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["index"] + [f"axis-{d}" for d in range(prob.ndim)] + ["probability"])
            for i, c in enumerate(pts):
                w.writerow([i] + list(map(int, c)) + [float(prob[tuple(c)])])
        print(f"{base}: {len(pts)} unique points -> {out}")


if __name__ == "__main__":
    main()
