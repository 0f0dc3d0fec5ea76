"""Rewrite the training-data dataset ID inside BMZ model zips.

Reference analog: biapy/utils/scripts/change_dataset_id_bmz_models.py —
for every packaged model in ``--input_dir`` whose filename contains
``--matching_str``, unzip, set ``training_data: {id: <id_to_set>}`` in
``rdf.yaml``, rezip into ``--output_dir``.

Usage:
    python -m biapy_tpu.utils.scripts.change_dataset_id_bmz_models \
        --input_dir models/ --output_dir out/ \
        --matching_str "mitochondria" --id_to_set sublime-pizza
"""

import argparse
import os
import shutil
import tempfile
import zipfile

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--matching_str", default="")
    p.add_argument("--id_to_set", required=True)
    args = p.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    names = [n for n in sorted(os.listdir(args.input_dir))
             if n.endswith(".zip") and args.matching_str in n]
    for name in names:
        src = os.path.join(args.input_dir, name)
        with tempfile.TemporaryDirectory() as tmp:
            with zipfile.ZipFile(src) as z:
                z.extractall(tmp)
            rdf_path = os.path.join(tmp, "rdf.yaml")
            with open(rdf_path) as fh:
                rdf = yaml.safe_load(fh)
            rdf["training_data"] = {"id": args.id_to_set}
            with open(rdf_path, "w") as fh:
                yaml.safe_dump(rdf, fh, sort_keys=False)
            dst = os.path.join(args.output_dir, name)
            with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
                for root, _, files in os.walk(tmp):
                    for f in files:
                        fp = os.path.join(root, f)
                        z.write(fp, os.path.relpath(fp, tmp))
        print(f"{name}: training_data.id = {args.id_to_set} -> {dst}")


if __name__ == "__main__":
    main()
