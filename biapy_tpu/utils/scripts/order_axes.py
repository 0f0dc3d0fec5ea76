"""Reorder the axes of chunked (Zarr/H5) volumes.

Reference analog: biapy/utils/scripts/order_axes.py.

Usage:
    python -m biapy_tpu.utils.scripts.order_axes \
        --input vol.zarr --output out.zarr --from_order ZYX --to_order XYZ
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--from_order", required=True)
    p.add_argument("--to_order", required=True)
    p.add_argument("--data_path", default=None)
    args = p.parse_args()

    from biapy_tpu.data.io import imread, imwrite

    src, dst = args.from_order.upper(), args.to_order.upper()
    if sorted(src) != sorted(dst):
        raise SystemExit(f"orders are not permutations: {src} vs {dst}")
    arr = imread(args.input, args.data_path)
    if arr.ndim != len(src):
        raise SystemExit(f"data has {arr.ndim} axes but from_order is {src}")
    arr = np.transpose(arr, [src.index(a) for a in dst])
    imwrite(args.output, arr, args.data_path)
    print(f"{args.input} {src} -> {args.output} {dst} {arr.shape}")


if __name__ == "__main__":
    main()
