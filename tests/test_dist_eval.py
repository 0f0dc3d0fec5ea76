"""DATA.VAL.DIST_EVAL semantics (reference: generators/__init__.py:489-503).

True  -> fast padded eval: the ragged final val batch is filled with duplicate
         samples (the reference's DistributedSampler padding) and a warning is
         printed.
False -> exact eval: the ragged batch is evaluated per sample so metrics are
         unbiased by padding, combined by true sample count.
"""

import os

import numpy as np
import pytest

from biapy_tpu.data.tiff import write_tiff


def _make_data(root, n):
    os.makedirs(f"{root}/train/x")
    os.makedirs(f"{root}/train/y")
    rng = np.random.default_rng(3)
    for i in range(n):
        img = rng.normal(0.5, 0.2, (32, 32)).astype(np.float32)
        msk = (img > 0.55).astype(np.uint8)
        write_tiff(f"{root}/train/x/{i:03d}.tif", (img * 255).clip(0, 255).astype(np.uint8))
        write_tiff(f"{root}/train/y/{i:03d}.tif", (msk * 255).astype(np.uint8))


def _cfg(root, dist_eval):
    return {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {
            "PATCH_SIZE": (32, 32, 1),
            "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y",
                      "IN_MEMORY": True},
            # 10 samples, split 0.5 -> 5 val samples; global batch 8 on the
            # 8-device mesh -> one ragged val batch of 5 (3 pad slots)
            "VAL": {"SPLIT_TRAIN": 0.5, "DIST_EVAL": dist_eval},
        },
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [1, 1]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3,
                  "BATCH_SIZE": 8, "EPOCHS": 1},
        "TEST": {"ENABLE": False},
    }


@pytest.mark.parametrize("dist_eval", [True, False])
def test_dist_eval_val_loop(tmp_path, dist_eval):
    from biapy_tpu._biapy import BiaPy

    root = str(tmp_path)
    _make_data(root, 10)
    job = BiaPy(_cfg(root, dist_eval), result_dir=f"{root}/results",
                name=f"disteval{int(dist_eval)}", silent=True)
    job.run_job()

    # the training JSONL must carry finite val metrics either way
    import glob
    import json

    logs = glob.glob(f"{root}/results/**/*_train.jsonl", recursive=True)
    assert logs, "training log not written"
    with open(logs[0]) as f:
        rec = json.loads(f.readlines()[-1])
    assert np.isfinite(rec["val_loss"]) and np.isfinite(rec["val_iou"])
