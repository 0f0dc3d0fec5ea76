"""End-to-end: 2D semantic segmentation on synthetic circle data.

Mirrors the reference's run_checks.py pattern (train a few epochs on a tiny
dataset, assert a metric gate on the test IoU) without downloads.
"""

import os

import numpy as np
import pytest

from biapy_tpu.data.tiff import write_tiff


def _make_data(root, n, d, seed):
    os.makedirs(f"{root}/{d}/x")
    os.makedirs(f"{root}/{d}/y")
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = np.zeros((128, 128), np.float32)
        msk = np.zeros((128, 128), np.uint8)
        for _ in range(3):
            cy, cx = rng.integers(20, 108, 2)
            r = rng.integers(8, 18)
            yy, xx = np.mgrid[:128, :128]
            circ = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            msk |= circ
            img += circ * 0.7
        img += rng.normal(0, 0.15, (128, 128))
        write_tiff(f"{root}/{d}/x/{i:03d}.tif", (img * 127 + 64).clip(0, 255).astype(np.uint8))
        write_tiff(f"{root}/{d}/y/{i:03d}.tif", (msk * 255).astype(np.uint8))


@pytest.mark.slow
def test_semantic_seg_end_to_end(tmp_path):
    root = str(tmp_path)
    _make_data(root, 10, "train", 0)
    _make_data(root, 4, "test", 1)

    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {
            "PATCH_SIZE": (64, 64, 1),
            "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
            "VAL": {"SPLIT_TRAIN": 0.2},
            "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y", "IN_MEMORY": True,
                     "LOAD_GT": True, "PADDING": (8, 8), "OVERLAP": (0.1, 0.1)},
        },
        "AUGMENTOR": {"ENABLE": True, "VFLIP": True, "HFLIP": True, "ROT90": True},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16, 32],
                  "DROPOUT_VALUES": [0.0, 0.0, 0.0], "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2, 2, 2]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 2.0e-3, "BATCH_SIZE": 8,
                  "EPOCHS": 15, "PATIENCE": 20,
                  "LR_SCHEDULER": {"NAME": "warmupcosine", "WARMUP_COSINE_DECAY_EPOCHS": 1,
                                   "MIN_LR": 1.0e-5}},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="e2etest", silent=True)
    job.run_job()
    stats = job.workflow.stats
    assert stats["iou"] > 0.4, f"IoU too low: {stats}"

    # checkpoint exists and embeds the config
    import glob

    ckpts = glob.glob(root + "/results/e2etest/checkpoints/*best.ckpt")
    assert ckpts, "best checkpoint was not written"
    from biapy_tpu.utils.misc import load_checkpoint

    ck = load_checkpoint(ckpts[0])
    assert "cfg" in ck and "params" in ck and ck["epoch"] >= 0

    # AUGMENTOR.AUG_SAMPLES (default on) dumped augmented examples
    aug = glob.glob(root + "/results/e2etest/results/e2etest/aug/aug_*_x.tif")
    assert aug, "AUG_SAMPLES should save augmented sample images"

    # in-memory predict API writes nothing and returns predictions
    from biapy_tpu.data.io import read_img_as_ndarray

    img = read_img_as_ndarray(f"{root}/test/x/000.tif", is_3d=False)
    before = set()
    for dirpath, _, files in os.walk(root + "/results"):
        before.update(os.path.join(dirpath, f) for f in files)
    preds = job.predict(img)
    after = set()
    for dirpath, _, files in os.walk(root + "/results"):
        after.update(os.path.join(dirpath, f) for f in files)
    assert preds and preds[0]["pred"].shape[:2] == img.shape[:2]
    assert before == after, "predict() must not write files"


@pytest.mark.slow
def test_bmz_export(tmp_path):
    root = str(tmp_path)
    _make_data(root, 4, "train", 0)

    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (64, 64, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25}},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16], "DROPOUT_VALUES": [0.0, 0.0],
                  "Z_DOWN": [2, 2], "YX_DOWN": [2, 2], "CONV_LAYERS": [1, 1]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3, "BATCH_SIZE": 4, "EPOCHS": 1},
        "TEST": {"ENABLE": False},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="bmztest", silent=True)
    job.train()
    zpath = job.export_model_to_bmz()
    import zipfile

    import yaml as _yaml

    with zipfile.ZipFile(zpath) as z:
        names = set(z.namelist())
        assert {"rdf.yaml", "test_input.npy", "test_output.npy", "README.md"} <= names
        rdf = _yaml.safe_load(z.read("rdf.yaml"))
        assert rdf["format_version"].startswith("0.5")
        assert rdf["config"]["biapy_tpu"]["workflow"] == "SEMANTIC_SEG"


@pytest.mark.slow
def test_semantic_seg_2d_as_3d_stack_zfilter(tmp_path):
    """TEST.ANALIZE_2D_IMGS_AS_3D_STACK: 2D slice predictions restacked as a
    3D volume with a z median filter (reference: run_checks Test1 — 2D stack
    as 3D, post-proc z-filtering). An isolated one-slice blob must be
    suppressed by the z filter in the stacked output while persisting across
    slices survives."""
    root = str(tmp_path)
    _make_data(root, 10, "train", 0)
    rng = np.random.default_rng(7)
    # test "volume" as ordered 2D slices: a blob at a fixed location on every
    # slice (z-persistent) plus a one-slice-only blob (z-noise)
    os.makedirs(f"{root}/test/x")
    os.makedirs(f"{root}/test/y")
    yy, xx = np.mgrid[:128, :128]
    persistent = ((yy - 40) ** 2 + (xx - 40) ** 2) < 14 * 14
    lone = ((yy - 90) ** 2 + (xx - 90) ** 2) < 12 * 12
    n_slices = 6
    for i in range(n_slices):
        m = persistent | (lone if i == 3 else False)
        img = m * 0.7 + rng.normal(0, 0.15, (128, 128))
        write_tiff(f"{root}/test/x/{i:03d}.tif", (img * 127 + 64).clip(0, 255).astype(np.uint8))
        write_tiff(f"{root}/test/y/{i:03d}.tif", (m * 255).astype(np.uint8))

    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {
            "PATCH_SIZE": (64, 64, 1),
            "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
            "VAL": {"SPLIT_TRAIN": 0.2},
            "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y", "IN_MEMORY": True,
                     "LOAD_GT": True, "PADDING": (8, 8)},
        },
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16, 32],
                  "DROPOUT_VALUES": [0.0, 0.0, 0.0], "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2, 2, 2]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 2.0e-3, "BATCH_SIZE": 8,
                  "EPOCHS": 12},
        "TEST": {"ENABLE": True, "ANALIZE_2D_IMGS_AS_3D_STACK": True,
                 "POST_PROCESSING": {"MEDIAN_FILTER": True,
                                     "MEDIAN_FILTER_AXIS": ["z"],
                                     "MEDIAN_FILTER_SIZE": [5]}},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="as3d", silent=True)
    job.run_job()
    stacks = [p for p in job.workflow._predictions if p.get("role") == "as_3d_stack"]
    assert stacks, "as_3d_stack prediction missing"
    stack = stacks[0]["pred"]
    assert stack.shape[0] == n_slices
    # z-median over 5 slices keeps the persistent blob but kills the lone one
    assert (stack[3][persistent] > 0.5).mean() > 0.5
    assert (stack[3][lone] > 0.5).mean() < 0.1
    assert os.path.isfile(root + "/results/as3d/results/as3d/as_3d_stack/stack.tif")
