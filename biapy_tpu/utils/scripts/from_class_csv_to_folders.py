"""Reorganize a flat image dir into class subfolders from a CSV mapping.

Reference analog: biapy/utils/scripts/from_class_csv_to_folders.py.
CSV columns: filename,class (header required; extra columns ignored).

Usage:
    python -m biapy_tpu.utils.scripts.from_class_csv_to_folders \
        --input images/ --csv labels.csv --output by_class/
"""

import argparse
import csv
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--csv", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--move", action="store_true", help="move instead of copy")
    args = p.parse_args()

    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    fn_col = next(k for k in rows[0] if "file" in k.lower() or "name" in k.lower())
    cls_col = next(k for k in rows[0] if "class" in k.lower() or "label" in k.lower())
    n = 0
    for r in rows:
        src = os.path.join(args.input, r[fn_col])
        if not os.path.exists(src):
            print(f"missing: {src}")
            continue
        dst_dir = os.path.join(args.output, str(r[cls_col]))
        os.makedirs(dst_dir, exist_ok=True)
        (shutil.move if args.move else shutil.copy2)(src, os.path.join(dst_dir, r[fn_col]))
        n += 1
    print(f"{n} files organized into {args.output}")


if __name__ == "__main__":
    main()
