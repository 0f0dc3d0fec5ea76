"""Histogram of instance sizes over a directory of label images.

Reference analog: biapy/utils/scripts/collect_instance_sizes.py.

Usage:
    python -m biapy_tpu.utils.scripts.collect_instance_sizes --input labels/ [--is_3d] [--bins 10]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--is_3d", action="store_true")
    p.add_argument("--bins", type=int, default=10)
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray

    sizes = []
    for f in list_image_files(args.input):
        lab = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.int64)
        _, cnts = np.unique(lab[lab > 0], return_counts=True)
        sizes.extend(cnts.tolist())
    sizes = np.asarray(sizes)
    if len(sizes) == 0:
        print("no instances found")
        return
    print(f"{len(sizes)} instances; size min={sizes.min()} median={int(np.median(sizes))} "
          f"mean={sizes.mean():.1f} max={sizes.max()}")
    hist, edges = np.histogram(sizes, bins=args.bins)
    for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
        print(f"  [{lo:10.0f}, {hi:10.0f}): {h}")


if __name__ == "__main__":
    main()
