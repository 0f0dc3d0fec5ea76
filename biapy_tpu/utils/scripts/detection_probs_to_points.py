"""Detection probability maps -> point CSVs via local-maxima extraction.

Reference analog: biapy/utils/scripts/detection_probs_to_points.py.

Usage:
    python -m biapy_tpu.utils.scripts.detection_probs_to_points \
        --input probs/ --output csvs/ --threshold 0.5 --min_distance 3 [--is_3d]
"""

import argparse
import csv
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--min_distance", type=int, default=3)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.data.post_processing import peak_local_max

    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        prob = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.float32)
        if prob.max() > 1.5:
            prob = prob / 255.0
        pts = peak_local_max(prob, min_distance=args.min_distance,
                             threshold_abs=args.threshold)
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.output, base + ".csv")
        with open(out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow([f"axis-{d}" for d in range(prob.ndim)] + ["probability"])
            for c in pts:
                w.writerow(list(map(int, c)) + [float(prob[tuple(c)])])
        print(f"{base}: {len(pts)} points -> {out}")


if __name__ == "__main__":
    main()
