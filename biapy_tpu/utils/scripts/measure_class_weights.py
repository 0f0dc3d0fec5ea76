"""Per-class voxel frequencies and inverse-frequency weights over a mask dir.

Reference analog: biapy/utils/scripts/measure_class_weights.py.

Usage:
    python -m biapy_tpu.utils.scripts.measure_class_weights --input masks/ [--is_3d]
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray

    counts = {}
    total = 0
    for f in list_image_files(args.input):
        m = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0]
        vals, cnts = np.unique(m.astype(np.int64), return_counts=True)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            counts[v] = counts.get(v, 0) + c
            total += c
    print("class, voxels, frequency, inv_freq_weight")
    inv = {k: total / v for k, v in counts.items()}
    norm = sum(inv.values())
    for k in sorted(counts):
        print(f"{k}, {counts[k]}, {counts[k] / total:.6f}, {inv[k] / norm:.6f}")


if __name__ == "__main__":
    main()
