"""Reorganise LightMyCells-challenge studies into x/ (transmitted light) and
y/ (one organelle's fluorescence) pair folders.

Reference analog: biapy/utils/scripts/lightmycell_data_preparation.py —
each Study folder mixes transmitted-light acquisitions (BF/PC/DIC) and
fluorescence targets named by organelle; for the chosen organelle, every
target is written to ``y/`` and its sibling transmitted-light images (same
acquisition prefix, modality token in the filename) to ``x/``, both prefixed
with the study name + modality so the multiple-raw-one-target loader pairs
them.

Usage:
    python -m biapy_tpu.utils.scripts.lightmycell_data_preparation \
        --input studies_root/ --output out_root/ --organelle Actin
"""

import argparse
import os

ORGANELLES = ["Nucleus", "Mitochondria", "Actin", "Tubulin"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="root containing Study folders")
    p.add_argument("--output", required=True)
    p.add_argument("--organelle", choices=ORGANELLES, required=True)
    args = p.parse_args()

    from biapy_tpu.data.io import read_img_as_ndarray, save_tif

    out = os.path.join(args.output, args.organelle)
    for folder in sorted(next(os.walk(args.input))[1]):
        fdir = os.path.join(args.input, folder)
        images = sorted(next(os.walk(fdir))[2])
        targets = [f for f in images if args.organelle in f]
        sources = [f for f in images if not any(o in f for o in ORGANELLES)]
        if not targets or not sources:
            continue
        for tgt in targets:
            prefix = "_".join(tgt.split("_")[:-1])
            related = [s for s in sources if prefix in s]
            if not related:
                continue
            modality = related[0].split("_")[2] if len(related[0].split("_")) > 2 else "TL"
            pair_dir = f"{folder}_{modality}_{tgt}"
            img = read_img_as_ndarray(os.path.join(fdir, tgt))
            save_tif(img[None], os.path.join(out, "y", pair_dir),
                     [pair_dir], verbose=False)
            for src in related:
                img = read_img_as_ndarray(os.path.join(fdir, src))
                save_tif(img[None], os.path.join(out, "x", pair_dir),
                         [f"{folder}_{modality}_{src}"], verbose=False)
            print(f"{folder}/{tgt}: 1 target + {len(related)} sources")


if __name__ == "__main__":
    main()
