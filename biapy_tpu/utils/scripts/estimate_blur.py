"""Rank images by blur (variance of Laplacian) to spot out-of-focus data.

Reference analog: biapy/utils/scripts/estimate_blur.py.

Usage:
    python -m biapy_tpu.utils.scripts.estimate_blur --input images/ [--is_3d]
"""

import argparse
import os

import numpy as np
from scipy import ndimage


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray

    rows = []
    for f in list_image_files(args.input):
        img = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.float32)
        rows.append((float(ndimage.laplace(img).var()), os.path.basename(f)))
    rows.sort()
    print("laplacian_variance, file   (low = blurry)")
    for v, name in rows:
        print(f"{v:.4f}, {name}")


if __name__ == "__main__":
    main()
