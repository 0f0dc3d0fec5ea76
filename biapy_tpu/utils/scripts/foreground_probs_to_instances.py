"""Binarize foreground probability maps and label connected components.

Reference analog: biapy/utils/scripts/foreground_probs_to_instances.py.

Usage:
    python -m biapy_tpu.utils.scripts.foreground_probs_to_instances \
        --input probs/ --output instances/ --threshold 0.5 [--min_size 10] [--is_3d]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--min_size", type=int, default=0)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif
    from biapy_tpu.data.post_processing import remove_small_instances
    from biapy_tpu.native import connected_components

    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        prob = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.float32)
        if prob.max() > 1.5:
            prob = prob / 255.0
        lab, _ = connected_components((prob > args.threshold).astype(np.uint8))
        if args.min_size > 0:
            lab = remove_small_instances(lab, args.min_size)
        n = int(lab.max())
        dtype = np.uint16 if n < 2 ** 16 else np.uint32
        save_tif(lab[None][..., None].astype(dtype), args.output,
                 [os.path.basename(f)], verbose=False)
        print(f"{os.path.basename(f)}: {n} instances")


if __name__ == "__main__":
    main()
