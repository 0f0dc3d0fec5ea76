"""Remove points closer than a radius from a CSV point file.

Reference analog: biapy/utils/scripts/filter_close_points.py.

Usage:
    python -m biapy_tpu.utils.scripts.filter_close_points \
        --input points.csv --output filtered.csv --radius 5 [--resolution 1 1 1]
"""

import argparse
import csv

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--radius", type=float, required=True)
    p.add_argument("--resolution", type=float, nargs="+", default=[1.0, 1.0, 1.0])
    args = p.parse_args()

    from biapy_tpu.data.post_processing import remove_close_points

    with open(args.input) as f:
        rows = list(csv.DictReader(f))
    axes = sorted([k for k in rows[0]], key=lambda a: a)
    axes = [k for k in rows[0] if k.startswith("axis-")]
    pts = np.asarray([[float(r[a]) for a in axes] for r in rows], np.float32)
    kept = remove_close_points(pts, args.radius, resolution=args.resolution)
    kept_set = {tuple(k) for k in kept.tolist()}
    out_rows = [r for r in rows if tuple(float(r[a]) for a in axes) in kept_set]
    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(out_rows)
    print(f"{len(rows)} -> {len(out_rows)} points (radius {args.radius})")


if __name__ == "__main__":
    main()
