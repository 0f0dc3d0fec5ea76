"""Remap semantic label IDs over a directory of label images.

Reference analog: biapy/utils/scripts/cityscape_remap_labels.py (hardcoded
Cityscapes 30->19 train-ID remap), generalized: ``--preset cityscapes`` or an
arbitrary ``--map old:new ...`` list; unmapped IDs go to ``--default``.

Usage:
    python -m biapy_tpu.utils.scripts.remap_labels \
        --input labels/ --output remapped/ --preset cityscapes
    python -m biapy_tpu.utils.scripts.remap_labels \
        --input labels/ --output remapped/ --map 0:0 50:1 100:2 --default 255
"""

import argparse
import os

import numpy as np

# Cityscapes labelId -> trainId (the standard 19-class mapping; 255 = ignore)
_CITYSCAPES = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--preset", choices=["cityscapes"], default=None)
    p.add_argument("--map", nargs="+", default=None, help="old:new pairs")
    p.add_argument("--default", type=int, default=255,
                   help="value for IDs absent from the map")
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    if args.preset == "cityscapes":
        mapping = dict(_CITYSCAPES)
    elif args.map:
        mapping = {int(k): int(v) for k, v in (s.split(":") for s in args.map)}
    else:
        raise SystemExit("provide --preset or --map")

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray, save_tif

    lut = np.full(max(mapping) + 1, args.default, np.int32)
    for k, v in mapping.items():
        lut[k] = v

    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        img = read_img_as_ndarray(f, is_3d=args.is_3d).astype(np.int64)
        out = np.where(img <= max(mapping), lut[np.clip(img, 0, max(mapping))],
                       args.default).astype(np.uint8 if max(
                           max(mapping.values()), args.default) < 256 else np.int32)
        save_tif(out[None], args.output, [os.path.basename(f)], verbose=False)
        print(f"{os.path.basename(f)}: {np.unique(img).size} ids -> "
              f"{np.unique(out).size} ids")


if __name__ == "__main__":
    main()
