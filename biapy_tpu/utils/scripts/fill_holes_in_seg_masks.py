"""Fill holes in binary/instance segmentation masks, per label.

Reference analog: biapy/utils/scripts/fill_holes_in_seg_masks.py.

Usage:
    python -m biapy_tpu.utils.scripts.fill_holes_in_seg_masks \
        --input masks/ --output filled/ [--is_3d]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif
    from biapy_tpu.native import fill_holes

    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        lab = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0]
        out = np.zeros_like(lab)
        for lb in np.unique(lab):
            if lb == 0:
                continue
            m = fill_holes((lab == lb).astype(np.uint8))
            out[m > 0] = lb
        save_tif(out[None][..., None].astype(lab.dtype), args.output,
                 [os.path.basename(f)], verbose=False)
        print(f"{os.path.basename(f)}: done")


if __name__ == "__main__":
    main()
