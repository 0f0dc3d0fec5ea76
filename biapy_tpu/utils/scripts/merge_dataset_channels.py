"""Stack per-channel image dirs into multi-channel images.

Reference analog: biapy/utils/scripts/merge_dataset_channels.py.

Usage:
    python -m biapy_tpu.utils.scripts.merge_dataset_channels \
        --inputs ch0/ ch1/ ch2/ --output merged/ [--is_3d]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif

    lists = [list_image_files(d) for d in args.inputs]
    n = len(lists[0])
    if any(len(l) != n for l in lists):
        raise SystemExit(f"channel dirs differ in file count: {[len(l) for l in lists]}")
    os.makedirs(args.output, exist_ok=True)
    for i in range(n):
        chans = [read_img_as_ndarray(l[i], is_3d=args.is_3d)[..., :1] for l in lists]
        merged = np.concatenate(chans, axis=-1)
        save_tif(merged[None], args.output, [os.path.basename(lists[0][i])], verbose=False)
        print(f"{os.path.basename(lists[0][i])}: {merged.shape}")


if __name__ == "__main__":
    main()
