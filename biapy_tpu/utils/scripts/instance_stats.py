"""Per-instance morphology statistics for a directory of label images.

Reference analog: the instance-stats scripts under biapy/utils/scripts/.

Usage:
    python -m biapy_tpu.utils.scripts.instance_stats --input labels_dir/ [--is_3d]
"""

import argparse
import csv
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", default=None, help="CSV output (default: stdout)")
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    import numpy as np

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.data.post_processing import measure_instance_properties

    out = open(args.output, "w", newline="") if args.output else sys.stdout
    w = csv.writer(out)
    w.writerow(["file", "instance_id", "size", "diameter", "centroid"])
    for f in list_image_files(args.input):
        lab = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.int32)
        props = measure_instance_properties(lab)
        for i in range(len(props["id"])):
            w.writerow([os.path.basename(f), int(props["id"][i]), int(props["size"][i]),
                        f"{props['diameter'][i]:.2f}",
                        " ".join(f"{c:.1f}" for c in props["centroid"][i])])
    if args.output:
        out.close()


if __name__ == "__main__":
    main()
