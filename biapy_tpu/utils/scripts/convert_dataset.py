"""Dataset format conversion: TIFF <-> HDF5 <-> Zarr.

Reference analog: the tif/h5/zarr conversion scripts under
biapy/utils/scripts/ (e.g. from_tif_to_h5.py, from_h5_to_zarr.py).

Usage:
    python -m biapy_tpu.utils.scripts.convert_dataset --input in.tif --output out.zarr
    python -m biapy_tpu.utils.scripts.convert_dataset --input dir/ --output outdir/ --to .h5
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="Input file or directory")
    p.add_argument("--output", required=True, help="Output file or directory")
    p.add_argument("--to", default=None, help="Target extension when converting a directory (e.g. .zarr)")
    p.add_argument("--data_path", default=None, help="Internal dataset path for h5/zarr inputs")
    args = p.parse_args()

    from biapy_tpu.data.io import imread, imwrite, list_image_files

    if os.path.isdir(args.input) and (args.to or os.path.splitext(args.output)[1] == ""):
        os.makedirs(args.output, exist_ok=True)
        for f in list_image_files(args.input):
            base = os.path.splitext(os.path.basename(f))[0]
            out = os.path.join(args.output, base + (args.to or ".tif"))
            imwrite(out, imread(f, args.data_path))
            print(f"{f} -> {out}")
    else:
        imwrite(args.output, imread(args.input, args.data_path))
        print(f"{args.input} -> {args.output}")


if __name__ == "__main__":
    main()
