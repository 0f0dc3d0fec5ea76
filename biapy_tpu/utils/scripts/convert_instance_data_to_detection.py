"""Instance label images -> detection point CSVs (one centroid per instance).

Reference analog: biapy/utils/scripts/convert_instance_data_to_detection.py.

Usage:
    python -m biapy_tpu.utils.scripts.convert_instance_data_to_detection \
        --input instances/ --output csvs/ [--is_3d]
"""

import argparse
import csv
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.data.post_processing import measure_instance_properties

    os.makedirs(args.output, exist_ok=True)
    for f in list_image_files(args.input):
        lab = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.int32)
        props = measure_instance_properties(lab)
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(args.output, base + ".csv")
        nd = lab.ndim
        with open(out, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow([f"axis-{d}" for d in range(nd)] + ["class"])
            for c in props["centroid"]:
                w.writerow([int(round(v)) for v in c] + [1])
        print(f"{base}: {len(props['id'])} points -> {out}")


if __name__ == "__main__":
    main()
