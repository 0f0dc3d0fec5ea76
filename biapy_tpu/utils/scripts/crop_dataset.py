"""Crop a dataset of images (optionally paired with masks) into patches.

Reference analog: biapy/utils/scripts/crop_2D_dataset.py,
crop_3D_dataset.py and crop_and_discard_3D_dataset.py — when ``--masks`` is
given, image/mask pairs are cropped in lockstep and ``--discard_empty`` drops
crops whose mask carries no labels (save_tif_pair_discard,
data_manipulation.py:3893).

Usage:
    python -m biapy_tpu.utils.scripts.crop_dataset --input dir/ --output outdir/ \
        --patch 256 256 --overlap 0.1 0.1
    python -m biapy_tpu.utils.scripts.crop_dataset --input x/ --masks y/ \
        --output out/ --patch 80 80 80 --discard_empty
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--masks", default=None, help="paired mask directory")
    p.add_argument("--output", required=True)
    p.add_argument("--patch", type=int, nargs="+", required=True)
    p.add_argument("--overlap", type=float, nargs="+", default=None)
    p.add_argument("--discard_empty", action="store_true",
                   help="drop crops whose mask has no foreground")
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif
    from biapy_tpu.data.patching import crop_data_with_overlap, pad_to_min_shape

    nd = len(args.patch)
    is_3d = args.is_3d or nd == 3
    ov = tuple(args.overlap) if args.overlap else (0.0,) * nd
    out_x = os.path.join(args.output, "x") if args.masks else args.output
    os.makedirs(out_x, exist_ok=True)
    if args.masks:
        mask_files = {os.path.splitext(os.path.basename(f))[0]: f
                      for f in list_image_files(args.masks)}
        out_y = os.path.join(args.output, "y")
        os.makedirs(out_y, exist_ok=True)

    kept = total = 0
    for f in list_image_files(args.input):
        img = read_img_as_ndarray(f, is_3d=is_3d)
        img, _ = pad_to_min_shape(img, tuple(args.patch))
        patches, _ = crop_data_with_overlap(img[None], tuple(args.patch) + (img.shape[-1],),
                                            overlap=ov, padding=(0,) * nd)
        base = os.path.splitext(os.path.basename(f))[0]
        mpatches = None
        if args.masks:
            mf = mask_files.get(base)
            if mf is None:
                print(f"{base}: no paired mask, skipped")
                continue
            mask = read_img_as_ndarray(mf, is_3d=is_3d)
            mask, _ = pad_to_min_shape(mask, tuple(args.patch))
            mpatches, _ = crop_data_with_overlap(
                mask[None], tuple(args.patch) + (mask.shape[-1],),
                overlap=ov, padding=(0,) * nd)
        d = len(str(len(patches)))
        for i in range(len(patches)):
            total += 1
            if args.discard_empty and mpatches is not None and mpatches[i].max() == 0:
                continue
            kept += 1
            name = f"{base}_crop{str(i).zfill(d)}.tif"
            save_tif(patches[i:i + 1], out_x, [name], verbose=False)
            if mpatches is not None:
                save_tif(mpatches[i:i + 1], out_y, [name], verbose=False)
        print(f"{f}: {len(patches)} patches")
    if args.discard_empty:
        print(f"kept {kept}/{total} crops with foreground")


if __name__ == "__main__":
    main()
