"""End-to-end instance segmentation and detection on synthetic data."""

import csv
import os

import numpy as np
import pytest

from biapy_tpu.data.tiff import write_tiff


def _labeled_circles(shape, n, rng, r_range=(6, 11)):
    lab = np.zeros(shape, np.uint16)
    img = np.zeros(shape, np.float32)
    centers = []
    tries = 0
    while len(centers) < n and tries < 200:
        tries += 1
        cy, cx = rng.integers(12, shape[0] - 12, 2)
        r = rng.integers(*r_range)
        if any((cy - y) ** 2 + (cx - x) ** 2 < (r + rr + 3) ** 2 for y, x, rr in centers):
            continue
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        lab[m] = len(centers) + 1
        img += m * 0.7
        centers.append((cy, cx, r))
    img += rng.normal(0, 0.08, shape)
    return (img * 200).clip(0, 255).astype(np.uint8), lab, centers


@pytest.mark.slow
def test_instance_seg_2d(tmp_path):
    rng = np.random.default_rng(21)
    root = str(tmp_path)
    for d, n in [("train", 12), ("test", 3)]:
        os.makedirs(f"{root}/{d}/x")
        os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            img, lab, _ = _labeled_circles((96, 96), 4, rng)
            write_tiff(f"{root}/{d}/x/{i:02d}.tif", img)
            write_tiff(f"{root}/{d}/y/{i:02d}.tif", lab)
    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "2D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
        "DATA": {"PATCH_SIZE": (64, 64, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.2},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y", "IN_MEMORY": True,
                          "LOAD_GT": True, "PADDING": (8, 8)}},
        "AUGMENTOR": {"ENABLE": True, "VFLIP": True, "HFLIP": True, "ROT90": True},
        "MODEL": {"ARCHITECTURE": "resunet", "FEATURE_MAPS": [8, 16, 32],
                  "DROPOUT_VALUES": [0.0, 0.0, 0.0], "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2, 2, 2]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 2.0e-3, "BATCH_SIZE": 8, "EPOCHS": 15},
        "TEST": {"ENABLE": True, "MATCHING_STATS_THS": [0.3, 0.5],
                 "MATCHING_STATS_THS_COLORED_IMG": [0.3],
                 "POST_PROCESSING": {"MEASURE_PROPERTIES": {
                     "ENABLE": True,
                     "REMOVE_BY_PROPERTIES": {"ENABLE": True, "PROPS": [["size"]],
                                              "VALUES": [[30]], "SIGNS": [["lt"]]}}}},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="inst2d", silent=True)
    job.run_job()
    agg = job.workflow.matching_stats
    f1_03 = [s for s in agg if abs(s["thresh"] - 0.3) < 1e-6][0]["f1"]
    assert f1_03 > 0.5, f"matching f1@0.3 too low: {agg}"
    # channel masks were cached
    assert os.path.isdir(f"{root}/train/y_FC_11")
    # colored TP/FN/FP overlays at the requested threshold
    import glob
    assert glob.glob(root + "/results/inst2d/results/inst2d/instance_associations/*_th_0.3.tif")


@pytest.mark.slow
def test_detection_2d_csv_gt(tmp_path):
    rng = np.random.default_rng(22)
    root = str(tmp_path)
    for d, n in [("train", 12), ("test", 3)]:
        os.makedirs(f"{root}/{d}/x")
        os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            img, lab, centers = _labeled_circles((96, 96), 4, rng, r_range=(4, 7))
            write_tiff(f"{root}/{d}/x/{i:02d}.tif", img)
            with open(f"{root}/{d}/y/{i:02d}.csv", "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["axis-0", "axis-1"])
                for cy, cx, _ in centers:
                    w.writerow([cy, cx])
    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "DETECTION", "NDIM": "2D",
                    "DETECTION": {"CENTRAL_POINT_DILATION": [2, 2]}},
        "DATA": {"PATCH_SIZE": (64, 64, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.2},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y", "IN_MEMORY": True,
                          "LOAD_GT": True, "PADDING": (8, 8)}},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16, 32],
                  "DROPOUT_VALUES": [0.0, 0.0, 0.0], "Z_DOWN": [2, 2, 2],
                  "YX_DOWN": [2, 2, 2], "CONV_LAYERS": [2, 2, 2]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 2.0e-3, "BATCH_SIZE": 8, "EPOCHS": 40},
        "TEST": {"ENABLE": True, "DET_MIN_TH_TO_BE_PEAK": 0.5,
                 "DET_PEAK_LOCAL_MAX_MIN_DISTANCE": 3, "DET_TOLERANCE": 8},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="det2d", silent=True)
    job.run_job()
    stats = job.workflow.stats
    assert stats["det_f1"] > 0.5, stats


def test_detection_point_extraction_options(tmp_path):
    """DET_POINT_CREATION_FUNCTION=blob_log, DET_TH_TYPE=auto and
    DET_IGNORE_POINTS_OUTSIDE_BOX (reference detection.py:366,699)."""
    from biapy_tpu.config.config import Config
    from biapy_tpu.engine.detection import Detection_Workflow

    heat = np.zeros((64, 64, 1), np.float32)
    pts = [(8, 8), (32, 32), (50, 20)]
    yy, xx = np.mgrid[:64, :64]
    for y, x in pts:
        heat[..., 0] += np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 3.0 ** 2))

    def build(**test_over):
        c = Config(".", "t")
        cfg = c.get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "DETECTION", "NDIM": "2D"},
            "DATA": {"PATCH_SIZE": (32, 32, 1),
                     "TRAIN": {"PATH": str(tmp_path), "GT_PATH": str(tmp_path)},
                     "TEST": {"PATH": str(tmp_path)}},
            "TEST": test_over})
        return Detection_Workflow(cfg, "t", verbose=False)

    wf = build(DET_MIN_TH_TO_BE_PEAK=0.5)
    base = wf._extract_points(heat)
    assert len(base) == 3

    wf = build(DET_TH_TYPE="auto")  # Otsu picks a sane threshold itself
    auto = wf._extract_points(heat)
    assert len(auto) == 3

    wf = build(DET_POINT_CREATION_FUNCTION="blob_log", DET_BLOB_LOG_MIN_SIGMA=2,
               DET_BLOB_LOG_MAX_SIGMA=4, DET_BLOB_LOG_NUM_SIGMA=3,
               DET_MIN_TH_TO_BE_PEAK=0.5)
    blobs = wf._extract_points(heat)
    assert len(blobs) == 3
    got = {tuple(c) for c in np.asarray(blobs)}
    for y, x in pts:
        assert any(abs(gy - y) <= 2 and abs(gx - x) <= 2 for gy, gx in got)

    wf = build(DET_MIN_TH_TO_BE_PEAK=0.5, DET_IGNORE_POINTS_OUTSIDE_BOX=[10, 10])
    inner = wf._extract_points(heat)
    assert len(inner) == 2  # (8,8) is inside the 10-px border margin
