"""Report image count, shapes, dtypes and total voxels of a dataset dir.

Reference analog: biapy/utils/scripts/measure_dataset_size.py.

Usage:
    python -m biapy_tpu.utils.scripts.measure_dataset_size --input images/ [--is_3d]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import lazy_image_shape, list_image_files, _is_chunked, imread

    files = list_image_files(args.input)
    total_vox = 0
    shapes = {}
    for f in files:
        if _is_chunked(f):
            shape, dt = lazy_image_shape(f, is_3d=args.is_3d)
        else:
            arr = imread(f)
            shape, dt = arr.shape, arr.dtype
        total_vox += int(np.prod(shape))
        shapes[str(shape) + " " + str(dt)] = shapes.get(str(shape) + " " + str(dt), 0) + 1
    print(f"{len(files)} files, {total_vox:,} voxels total")
    for s, n in sorted(shapes.items(), key=lambda kv: -kv[1]):
        print(f"  {n} x {s}")


if __name__ == "__main__":
    main()
