"""Crop a dataset of images into patches on disk.

Reference analog: biapy/utils/scripts crop generation scripts.

Usage:
    python -m biapy_tpu.utils.scripts.crop_dataset --input dir/ --output outdir/ \
        --patch 256 256 --overlap 0.1 0.1
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--patch", type=int, nargs="+", required=True)
    p.add_argument("--overlap", type=float, nargs="+", default=None)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif
    from biapy_tpu.data.patching import crop_data_with_overlap

    nd = len(args.patch)
    ov = tuple(args.overlap) if args.overlap else (0.0,) * nd
    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        img = read_img_as_ndarray(f, is_3d=args.is_3d)
        patches, _ = crop_data_with_overlap(img[None], tuple(args.patch) + (img.shape[-1],),
                                            overlap=ov, padding=(0,) * nd)
        base = os.path.splitext(os.path.basename(f))[0]
        names = [f"{base}_p{i:04d}.tif" for i in range(len(patches))]
        save_tif(patches, args.output, names, verbose=False)
        print(f"{f}: {len(patches)} patches")


if __name__ == "__main__":
    main()
