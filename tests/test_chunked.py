"""By-chunks engine tests: tile grid, oracle instance merge, full pipeline."""

import os

import numpy as np
import pytest

from biapy_tpu.data.zarr_store import ZarrArray
from biapy_tpu.engine.chunked import ChunkedInference, Tile, tile_grid
from biapy_tpu.utils.matching import matching


def _spheres(shape=(48, 96, 96), n=10, seed=3):
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.int32)
    centers = []
    tries = 0
    while len(centers) < n and tries < 500:
        tries += 1
        c = rng.integers(8, np.array(shape) - 8)
        r = int(rng.integers(4, 7))
        if any(np.sum((c - cc) ** 2) < (r + rr + 2) ** 2 for cc, rr in centers):
            continue
        zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
        lab[((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) < r * r] = len(centers) + 1
        centers.append((c, r))
    return lab


class _IdentityStubWF:
    """Identity 'prediction' honoring predict_block_on_device's chunked
    pre-padded contract: blocks arrive uniformly padded by `padding` per
    side, and with out_splits the return is a tuple of CORE z-chunks."""

    norm_spec = {"type": "none", "percentile_clip": False, "out_dtype": "float32"}

    def __init__(self):
        self.calls = 0

    def predict_block_on_device(self, block, overlap=None, padding=None,
                                device=None, sync=False, norm_stats=None,
                                out_splits=None, pre_padded=False):
        self.calls += 1
        h = tuple(padding) if padding is not None else (0,) * (block.ndim - 1)
        nd = block.ndim - 1
        core = block[tuple(slice(h[d], block.shape[d] - h[d]) for d in range(nd))]
        if out_splits is not None:
            return tuple(core[z0:z1] for z0, z1 in out_splits)
        return block


def test_tile_grid_covers_volume():
    tiles = tile_grid((48, 96, 96), (32, 48, 48), (8, 8, 8))
    assert len(tiles) == 2 * 2 * 2
    covered = np.zeros((48, 96, 96), bool)
    for t in tiles:
        sl = tuple(slice(s, e) for s, e in zip(t.core_start, t.core_end))
        assert not covered[sl].any(), "tile cores must be disjoint"
        covered[sl] = True
    assert covered.all(), "tile cores must cover the volume"


class _OracleWorkflow:
    """Stub workflow whose 'prediction' is the GT channel representation."""

    def __init__(self, labels):
        from biapy_tpu.config.config import get_cfg_defaults

        self.labels = labels
        self.norm_spec = {"type": "none", "percentile_clip": False, "out_dtype": "float32"}
        cfg = get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                        "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
            "DATA": {"PATCH_SIZE": (32, 48, 48, 1)},
        })
        self.cfg = cfg

    def predict_patches(self, patches):  # unused by the merge test
        raise NotImplementedError


def test_instance_merge_across_tiles(tmp_path):
    """Oracle merge: per-tile watershed over GT-derived channels must
    reassemble the global instances (reference: 5-pass merge)."""
    from biapy_tpu.data.pre_processing import labels_into_channels
    from biapy_tpu.engine.instance_seg import Instance_Segmentation_Workflow

    labels = _spheres()
    chans = labels_into_channels(labels, ["F", "C"])

    # write the "raw prediction" zarr directly from the oracle channels
    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw = ZarrArray.create(os.path.join(out_dir, "raw_pred.zarr"),
                           shape=chans.shape, chunks=(32, 48, 48, 2), dtype="f4",
                           compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = chans

    wf = _OracleWorkflow(labels)
    ci = ChunkedInference(wf, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1), 2, out_dir)

    # borrow the real workflow's watershed-based instance_fn
    from biapy_tpu.config.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
        "DATA": {"PATCH_SIZE": (32, 48, 48, 1)},
    })
    inst_wf = Instance_Segmentation_Workflow.__new__(Instance_Segmentation_Workflow)
    inst_wf.cfg = cfg
    inst_wf.nd = 3
    inst_wf.define_activations_and_channels()

    inst_path = ci.create_and_merge_instances(
        os.path.join(out_dir, "raw_pred.zarr"), inst_wf.instance_seg_process,
        merge_iou_th=0.2, verbose=False,
    )
    merged = np.asarray(ZarrArray(inst_path))
    n_true = int(labels.max())
    stats = matching(labels, merged, thresh=[0.5])[0]
    assert stats["f1"] > 0.9, stats
    # instance count close to truth (no duplicated cross-tile ids)
    n_pred = len(np.unique(merged)) - 1
    assert abs(n_pred - n_true) <= 1, (n_pred, n_true)


@pytest.mark.slow
@pytest.mark.parametrize("quant", [False, True],
                         ids=["f32_store", "uint8_store"])
def test_by_chunks_end_to_end(tmp_path, quant):
    """Train a tiny 3D net on spheres, then by-chunks zarr inference with
    instance merging (reference: run_checks Test24-style). The quant variant
    stores the raw-pred Zarr as round(p*255) uint8 (TEST.OUTPUT_QUANT_UINT8,
    the bench's product drain) and must reach the same f1 gate."""
    from biapy_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(5)
    root = str(tmp_path)
    os.makedirs(f"{root}/train/x")
    os.makedirs(f"{root}/train/y")
    for i in range(10):
        lab = _spheres((32, 64, 64), n=5, seed=100 + i)
        img = (lab > 0) * 0.7 + rng.normal(0, 0.08, lab.shape)
        write_tiff(f"{root}/train/x/{i}.tif", (img * 200).clip(0, 255).astype(np.uint8))
        write_tiff(f"{root}/train/y/{i}.tif", lab.astype(np.uint16))
    # big test volume as zarr
    os.makedirs(f"{root}/test/x")
    lab_big = _spheres((48, 96, 96), n=10, seed=7)
    img_big = ((lab_big > 0) * 0.7 + rng.normal(0, 0.08, lab_big.shape))
    img_u8 = (img_big * 200).clip(0, 255).astype(np.uint8)
    z = ZarrArray.create(f"{root}/test/x/vol.zarr", shape=img_u8.shape, chunks=(16, 48, 48),
                         dtype="u1", compressor={"id": "zlib", "level": 1})
    z[:, :, :] = img_u8

    from biapy_tpu._biapy import BiaPy

    cfg = {
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"],
                                     "WATERSHED": {"SEED_MORPH_SEQUENCE": ["erode", "dilate"],
                                                   "SEED_MORPH_RADIUS": [1, 2]}}},
        "DATA": {"PATCH_SIZE": (16, 32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y",
                           "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.2},
                 "TEST": {"PATH": f"{root}/test/x", "LOAD_GT": False, "PADDING": (2, 4, 4),
                          "OVERLAP": (0, 0, 0)}},
        "MODEL": {"ARCHITECTURE": "resunet", "FEATURE_MAPS": [8, 16], "DROPOUT_VALUES": [0.0, 0.0],
                  "Z_DOWN": [1, 2], "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2],
                  "ISOTROPY": [False, True]},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 2.0e-3, "BATCH_SIZE": 8,
                  "EPOCHS": 25},
        "TEST": {"ENABLE": True,
                 "OUTPUT_QUANT_UINT8": quant,
                 "BY_CHUNKS": {"ENABLE": True,
                               "WORKFLOW_PROCESS": {"ENABLE": True, "PATCHES_PER_TILE": [2, 2, 2],
                                                    "INSTANCE_SEG_MERGE_IOU_TH": 0.2}},
                 "POST_PROCESSING": {"MEASURE_PROPERTIES": {
                     "ENABLE": True,
                     "REMOVE_BY_PROPERTIES": {"ENABLE": True, "PROPS": [["size"]],
                                              "VALUES": [[30]], "SIGNS": [["lt"]]}}}},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="chunk3d", silent=True)
    job.run_job()
    preds = [p for p in job.workflow._predictions if p["role"] == "instances_zarr"]
    assert preds, "by-chunks instances zarr missing"
    merged = np.asarray(ZarrArray(preds[0]["path"]))
    stats = matching(lab_big, merged, thresh=[0.3])[0]
    assert stats["f1"] > 0.5, stats


def test_instance_merge_two_ranks_simulated(tmp_path):
    """The 5-pass merge with world=2: two ChunkedInference instances run in
    threads with thread-backed collectives (honest simulation of two hosts
    exchanging edges/offsets over DCN) and must reproduce the single-rank
    result."""
    import threading

    import biapy_tpu.engine.chunked as ch
    from biapy_tpu.data.pre_processing import labels_into_channels
    from biapy_tpu.engine.instance_seg import Instance_Segmentation_Workflow
    from biapy_tpu.config.config import get_cfg_defaults

    labels = _spheres()
    chans = labels_into_channels(labels, ["F", "C"])
    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw = ZarrArray.create(os.path.join(out_dir, "raw_pred.zarr"),
                           shape=chans.shape, chunks=(32, 48, 48, 2), dtype="f4",
                           compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = chans

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
        "DATA": {"PATCH_SIZE": (32, 48, 48, 1)},
    })
    inst_wf = Instance_Segmentation_Workflow.__new__(Instance_Segmentation_Workflow)
    inst_wf.cfg = cfg
    inst_wf.nd = 3
    inst_wf.define_activations_and_channels()

    world = 2
    sync = threading.Barrier(world)
    gather_box = {}
    lock = threading.Lock()
    gen = [0]

    def fake_barrier(name="b"):
        sync.wait(timeout=60)

    def fake_gather(obj, _rank=None, _slot=[0]):
        # two-phase: deposit under (generation, rank), wait, read both
        rank = int(threading.current_thread().name[-1])
        with lock:
            g = gen[0]
            gather_box[(g, rank)] = obj
        sync.wait(timeout=60)
        out = [gather_box[(g, r)] for r in range(world)]
        sync.wait(timeout=60)
        with lock:
            if (g, 0) in gather_box:
                for r in range(world):
                    gather_box.pop((g, r), None)
                gen[0] += 1
        return out

    orig_barrier, orig_gather = ch.barrier, ch.all_gather_objects
    ch.barrier, ch.all_gather_objects = fake_barrier, fake_gather
    results = {}
    try:
        def run(rank):
            wf = _OracleWorkflow(labels)
            ci = ChunkedInference(wf, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1),
                                  2, out_dir, rank=rank, world=world)
            results[rank] = ci.create_and_merge_instances(
                os.path.join(out_dir, "raw_pred.zarr"), inst_wf.instance_seg_process,
                merge_iou_th=0.2, verbose=False)

        threads = [threading.Thread(target=run, args=(r,), name=f"rank{r}") for r in range(world)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
            assert not t.is_alive(), "rank thread hung"
    finally:
        ch.barrier, ch.all_gather_objects = orig_barrier, orig_gather

    merged = np.asarray(ZarrArray(results[0]))
    stats = matching(labels, merged, thresh=[0.5])[0]
    assert stats["f1"] > 0.9, stats
    n_pred = len(np.unique(merged)) - 1
    assert abs(n_pred - int(labels.max())) <= 1, (n_pred, int(labels.max()))


def test_detection_by_chunks_points(tmp_path):
    """By-chunks detection: per-tile peak extraction with core ownership
    (no double counting across halos), global close-point merge, metrics
    straight from the GT CSV (reference: detection.py:902,992)."""
    import csv as _csv

    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.detection import Detection_Workflow

    shape = (48, 96, 96)
    # one point sits exactly on a tile-core boundary (z=24 with tile_size
    # 24) so it is visible in two tiles' halos; the close pair must merge
    true_pts = np.array([[10, 20, 20], [24, 48, 48], [40, 80, 30]], np.int64)
    close_extra = np.array([[40, 82, 30]], np.int64)  # within radius of the 3rd
    heat = np.zeros(shape + (1,), np.float32)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for p in np.concatenate([true_pts, close_extra]):
        d2 = (zz - p[0]) ** 2 + (yy - p[1]) ** 2 + (xx - p[2]) ** 2
        heat[..., 0] = np.maximum(heat[..., 0], np.exp(-d2 / 8.0))

    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw_path = os.path.join(out_dir, "raw_pred.zarr")
    raw = ZarrArray.create(raw_path, shape=heat.shape, chunks=(24, 32, 32, 1),
                           dtype="f4", compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = heat

    gt_dir = str(tmp_path / "gt")
    os.makedirs(gt_dir)
    with open(os.path.join(gt_dir, "vol.csv"), "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["axis-0", "axis-1", "axis-2"])
        for p in true_pts:
            w.writerow(list(map(int, p)))

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "DETECTION", "NDIM": "3D"},
        "DATA": {"PATCH_SIZE": (32, 48, 48, 1), "TEST": {"LOAD_GT": True}},
        "TEST": {"DET_TH_TYPE": "manual", "DET_MIN_TH_TO_BE_PEAK": 0.5,
                 "DET_TOLERANCE": 3,
                 "BY_CHUNKS": {"ENABLE": True, "WORKFLOW_PROCESS": {"ENABLE": True}},
                 "POST_PROCESSING": {"REMOVE_CLOSE_POINTS": True,
                                     "REMOVE_CLOSE_POINTS_RADIUS": 4.0}},
    })
    wf = Detection_Workflow.__new__(Detection_Workflow)
    wf.cfg = cfg
    wf.nd = 3
    wf.is_3d = True
    wf.save_to_disk = False
    wf.metrics_per_test_file = []
    wf._predictions = []
    wf._original_test_gt_path = gt_dir

    ci = ChunkedInference(wf, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1), 1, out_dir)
    wf.after_by_chunks_prediction(ci, raw_path, "vol")

    pts = [p for p in wf._predictions if p["role"] == "points"][0]["points"]
    assert len(pts) == 3, pts  # close pair merged; boundary point counted once
    for tp in true_pts:
        assert np.min(np.linalg.norm(pts - tp, axis=1)) <= 3.0, (tp, pts)
    assert wf.metrics_per_test_file and wf.metrics_per_test_file[0]["det_f1"] == 1.0


def test_by_chunks_roi_skips_tiles(tmp_path):
    """ROI-gated by-chunks prediction: tiles with no ROI voxel in their core
    are never predicted, partially-covered cores are masked (reference:
    config.py:934)."""

    _IdentityWF = _IdentityStubWF

    vol = np.random.default_rng(0).random((48, 96, 96)).astype(np.float32)
    vol_path = str(tmp_path / "vol.zarr")
    z = ZarrArray.create(vol_path, shape=vol.shape, chunks=(24, 48, 48),
                         dtype="f4", compressor={"id": "zlib", "level": 1})
    z[:, :, :] = vol
    roi = np.zeros(vol.shape, np.uint8)
    roi[:, :40, :] = 1  # half-covers the first tile row in y

    wf = _IdentityWF()
    out_dir = str(tmp_path / "chunks")
    ci = ChunkedInference(wf, (32, 56, 56), (0, 0, 0), (4, 4, 4), (1, 1, 1), 1, out_dir)
    assert ci.tile_size == (24, 48, 48)
    out_path = ci.predict_volume(vol_path, roi=roi, verbose=False)
    out = np.asarray(ZarrArray(out_path))[..., 0]

    assert wf.calls == 4, wf.calls  # y>=48 tile column never predicted
    assert np.allclose(out[:, :40, :], vol[:, :40, :])
    assert not out[:, 40:, :].any()


def test_detection_by_chunks_zoom_rescale(tmp_path):
    """DATA.PREPROCESS.ZOOM under by-chunks rescales the final detection
    coordinates by the per-axis factor (reference detection.py:1044-1052 —
    the key's only live effect)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.detection import Detection_Workflow

    shape = (32, 64, 64)
    heat = np.zeros(shape + (1,), np.float32)
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    p = (16, 32, 48)
    heat[..., 0] = np.exp(-(((zz - p[0]) ** 2 + (yy - p[1]) ** 2 + (xx - p[2]) ** 2)) / 8.0)
    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw_path = os.path.join(out_dir, "raw_pred.zarr")
    raw = ZarrArray.create(raw_path, shape=heat.shape, chunks=(16, 32, 32, 1),
                           dtype="f4", compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = heat

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "DETECTION", "NDIM": "3D"},
        "DATA": {"PATCH_SIZE": (16, 32, 32, 1),
                 "PREPROCESS": {"ZOOM": {"ENABLE": True, "ZOOM_FACTOR": [2, 4, 8]}},
                 "TEST": {"LOAD_GT": False, "INPUT_IMG_AXES_ORDER": "ZYX"}},
        "TEST": {"DET_TH_TYPE": "manual", "DET_MIN_TH_TO_BE_PEAK": 0.5,
                 "BY_CHUNKS": {"ENABLE": True, "WORKFLOW_PROCESS": {"ENABLE": True}}},
    })
    wf = Detection_Workflow.__new__(Detection_Workflow)
    wf.cfg = cfg
    wf.nd = 3
    wf.is_3d = True
    wf.save_to_disk = False
    wf.metrics_per_test_file = []
    wf._predictions = []
    wf._original_test_gt_path = ""

    ci = ChunkedInference(wf, (16, 32, 32), (0, 0, 0), (2, 4, 4), (1, 1, 1), 1, out_dir)
    wf.after_by_chunks_prediction(ci, raw_path, "vol")
    pts = [q for q in wf._predictions if q["role"] == "points"][0]["points"]
    assert len(pts) == 1
    assert np.allclose(pts[0], [16 / 2, 32 / 4, 48 / 8]), pts


def test_by_chunks_axes_order_cyx(tmp_path):
    """A volume stored channel-first (CZYX) streams through by-chunks via
    the lazy canonical view — never materialised, same result as ZYXC
    (reference: chunked generator axes translation)."""

    _IdentityWF = _IdentityStubWF

    rng = np.random.default_rng(1)
    vol = rng.random((2, 48, 96, 96)).astype(np.float32)  # C,Z,Y,X on disk
    vol_path = str(tmp_path / "vol.zarr")
    z = ZarrArray.create(vol_path, shape=vol.shape, chunks=(2, 24, 48, 48),
                         dtype="f4", compressor={"id": "zlib", "level": 1})
    z[:, :, :, :] = vol

    out_dir = str(tmp_path / "chunks")
    ci = ChunkedInference(_IdentityWF(), (32, 56, 56), (0, 0, 0), (4, 4, 4),
                          (1, 1, 1), 2, out_dir)
    out_path = ci.predict_volume(vol_path, verbose=False, axes_order="CZYX")
    out = np.asarray(ZarrArray(out_path))
    assert out.shape == (48, 96, 96, 2)
    assert np.allclose(out, np.moveaxis(vol, 0, -1))


def test_by_chunks_entire_pred(tmp_path):
    """WORKFLOW_PROCESS.TYPE=entire_pred loads the full raw prediction and
    runs the normal per-image instance post-processing in one piece
    (reference: instance_seg.py:2369)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.data.pre_processing import labels_into_channels
    from biapy_tpu.engine.instance_seg import Instance_Segmentation_Workflow

    labels = _spheres()
    chans = labels_into_channels(labels, ["F", "C"])
    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw_path = os.path.join(out_dir, "raw_pred.zarr")
    raw = ZarrArray.create(raw_path, shape=chans.shape, chunks=(32, 48, 48, 2),
                           dtype="f4", compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = chans

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
        "DATA": {"PATCH_SIZE": (32, 48, 48, 1)},
        "TEST": {"BY_CHUNKS": {"ENABLE": True,
                               "WORKFLOW_PROCESS": {"ENABLE": True,
                                                    "TYPE": "entire_pred"}}},
    })
    wf = Instance_Segmentation_Workflow.__new__(Instance_Segmentation_Workflow)
    wf.cfg = cfg
    wf.nd = 3
    wf.is_3d = True
    wf.verbose = False
    wf.save_to_disk = False
    wf.synapse_mode = False
    wf.metrics_per_test_file = []
    wf._predictions = []
    wf.define_activations_and_channels()

    wf2 = _OracleWorkflow(labels)
    ci = ChunkedInference(wf2, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1), 2, out_dir)
    wf.after_by_chunks_prediction(ci, raw_path, "vol")
    inst = [p for p in wf._predictions if p["role"] == "instances"][0]["instances"]
    stats = matching(labels, inst, thresh=[0.5])[0]
    assert stats["f1"] > 0.9, stats


def test_by_chunks_default_axes_channels_last(tmp_path):
    """With the untouched 'TZCYX' config default, a (Z,Y,X,C<=4) zarr must be
    recognized as channels-last instead of being misread as Z,C,Y,X."""

    _IdentityWF = _IdentityStubWF

    rng = np.random.default_rng(2)
    vol = rng.random((48, 96, 96, 2)).astype(np.float32)  # Z,Y,X,C on disk
    vol_path = str(tmp_path / "vol.zarr")
    z = ZarrArray.create(vol_path, shape=vol.shape, chunks=(24, 48, 48, 2),
                         dtype="f4", compressor={"id": "zlib", "level": 1})
    z[:, :, :, :] = vol
    ci = ChunkedInference(_IdentityWF(), (32, 56, 56), (0, 0, 0), (4, 4, 4),
                          (1, 1, 1), 2, str(tmp_path / "chunks"))
    out_path = ci.predict_volume(vol_path, verbose=False, axes_order="TZCYX",
                                 axes_order_is_default=True)
    out = np.asarray(ZarrArray(out_path))
    assert out.shape == (48, 96, 96, 2)
    assert np.allclose(out, vol)


def test_detection_by_chunks_multiclass(tmp_path):
    """By-chunks multiclass detection keeps per-point classes through the
    tile merge, writes the class column, and scores class-aware metrics."""
    import csv as _csv

    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.detection import Detection_Workflow

    shape = (48, 96, 96)
    true_pts = np.array([[10, 20, 20], [24, 48, 48], [40, 80, 30]], np.int64)
    true_cls = np.array([1, 2, 1])
    heat = np.zeros(shape + (1,), np.float32)
    cls_probs = np.zeros(shape + (3,), np.float32)
    cls_probs[..., 0] = 1.0
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    for p, k in zip(true_pts, true_cls):
        d2 = (zz - p[0]) ** 2 + (yy - p[1]) ** 2 + (xx - p[2]) ** 2
        heat[..., 0] = np.maximum(heat[..., 0], np.exp(-d2 / 8.0))
        blob = d2 <= 9
        cls_probs[blob] = 0
        cls_probs[blob, k] = 1.0
    pred = np.concatenate([heat, cls_probs], axis=-1)

    out_dir = str(tmp_path / "chunks")
    os.makedirs(out_dir)
    raw_path = os.path.join(out_dir, "raw_pred.zarr")
    raw = ZarrArray.create(raw_path, shape=pred.shape, chunks=(24, 32, 32, 4),
                           dtype="f4", compressor={"id": "zlib", "level": 1})
    raw[:, :, :, :] = pred

    gt_dir = str(tmp_path / "gt")
    os.makedirs(gt_dir)
    with open(os.path.join(gt_dir, "vol.csv"), "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["axis-0", "axis-1", "axis-2", "class"])
        for p, k in zip(true_pts, true_cls):
            w.writerow(list(map(int, p)) + [int(k)])

    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "DETECTION", "NDIM": "3D"},
        "DATA": {"PATCH_SIZE": (32, 48, 48, 1), "N_CLASSES": 3,
                 "TEST": {"LOAD_GT": True}},
        "TEST": {"DET_TH_TYPE": "manual", "DET_MIN_TH_TO_BE_PEAK": 0.5,
                 "DET_TOLERANCE": 3,
                 "BY_CHUNKS": {"ENABLE": True, "WORKFLOW_PROCESS": {"ENABLE": True}}},
    })
    wf = Detection_Workflow.__new__(Detection_Workflow)
    wf.cfg = cfg
    wf.nd = 3
    wf.is_3d = True
    wf.save_to_disk = False
    wf.metrics_per_test_file = []
    wf._predictions = []
    wf._original_test_gt_path = gt_dir
    wf.define_activations_and_channels()

    ci = ChunkedInference(wf, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1), 4, out_dir)
    wf.after_by_chunks_prediction(ci, raw_path, "vol")
    entry = [p for p in wf._predictions if p["role"] == "points"][0]
    assert len(entry["points"]) == 3
    assert sorted(entry["classes"].tolist()) == [1, 1, 2]
    m = wf.metrics_per_test_file[0]
    assert m["det_f1"] == 1.0 and m["det_f1_class"] == 1.0, m


def test_dequant_pred_roundtrip():
    from biapy_tpu.engine.chunked import dequant_pred

    p = np.linspace(0, 1, 11, dtype=np.float32)
    q = np.round(p * 255).astype(np.uint8)
    back = dequant_pred(q)
    assert back.dtype == np.float32
    assert np.abs(back - p).max() <= 1 / 510 + 1e-6
    # float input passes through
    f = np.asarray([0.25], np.float32)
    assert dequant_pred(f).dtype == np.float32 and float(dequant_pred(f)[0]) == 0.25


def test_predict_volume_quant_uint8_storage(tmp_path):
    """TEST.OUTPUT_QUANT_UINT8 makes predict_volume store the raw-pred Zarr
    as uint8 (1/4 the bytes) and every downstream reader dequantizes —
    pinned here end-to-end through the oracle merge (VERDICT r4 drain
    story)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.data.pre_processing import labels_into_channels
    from biapy_tpu.engine.instance_seg import Instance_Segmentation_Workflow
    from biapy_tpu.utils.matching import matching

    labels = _spheres()
    chans = labels_into_channels(labels, ["F", "C"]).astype(np.float32)

    class _QuantOracleWF:
        norm_spec = {"type": "none", "percentile_clip": False,
                     "out_dtype": "float32"}

        def __init__(self):
            cfg = get_cfg_defaults()
            cfg.merge_from_dict({
                "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "3D",
                            "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "C"]}},
                "DATA": {"PATCH_SIZE": (32, 48, 48, 1)},
                "TEST": {"OUTPUT_QUANT_UINT8": True},
            })
            self.cfg = cfg

        def predict_block_on_device(self, block, overlap=None, padding=None,
                                    device=None, sync=False, norm_stats=None,
                                    out_splits=None, pre_padded=False):
            # oracle: quantized GT channels for the block's CORE (mirrors
            # the real program's round(p*255) uint8 output under quant)
            h = tuple(padding)
            nd = block.ndim - 1
            core = self._core
            q = np.round(np.clip(core, 0.0, 1.0) * 255).astype(np.uint8)
            if out_splits is not None:
                return tuple(q[z0:z1] for z0, z1 in out_splits)
            return q

    # volume = the channels themselves; identity-net semantics via _core
    vol_path = str(tmp_path / "vol.zarr")
    z = ZarrArray.create(vol_path, shape=chans.shape, chunks=(32, 48, 48, 2),
                         dtype="f4", compressor={"id": "zlib", "level": 1})
    z[:, :, :, :] = chans

    wf = _QuantOracleWF()
    out_dir = str(tmp_path / "chunks")
    ci = ChunkedInference(wf, (32, 48, 48), (0, 0, 0), (4, 8, 8), (1, 1, 1),
                          2, out_dir)
    # feed the per-tile core through the stub (predict_volume hands blocks;
    # the stub needs the core slice -> wrap predict_block_on_device)
    import types

    orig = wf.predict_block_on_device

    def wrapped(block, **kw):
        h = tuple(kw.get("padding"))
        nd = block.ndim - 1
        wf._core = block[tuple(slice(h[d], block.shape[d] - h[d])
                               for d in range(nd))]
        return orig(block, **kw)

    wf.predict_block_on_device = wrapped
    raw_path = ci.predict_volume(vol_path, verbose=False)

    raw = ZarrArray(raw_path)
    assert str(raw.dtype) in ("uint8", "u1", "|u1"), raw.dtype
    from biapy_tpu.engine.chunked import dequant_pred

    back = dequant_pred(raw[:, :, :, :])
    assert np.abs(back - chans).max() <= 1 / 510 + 1e-6

    # the merge dequantizes pass-A reads (u1 -> [0,1]) and still
    # reassembles the instances
    cfg = wf.cfg
    inst_wf = Instance_Segmentation_Workflow.__new__(Instance_Segmentation_Workflow)
    inst_wf.cfg = cfg
    inst_wf.nd = 3
    inst_wf.define_activations_and_channels()
    inst_path = ci.create_and_merge_instances(
        raw_path, inst_wf.instance_seg_process, merge_iou_th=0.2, verbose=False)
    merged = np.asarray(ZarrArray(inst_path))
    stats = matching(labels, merged, thresh=[0.5])[0]
    assert stats["f1"] > 0.9, stats


def test_predict_volume_quant_host_fallback_quantizes(tmp_path):
    """A workflow falling back to the host path (predict_block_on_device
    returning None, e.g. TTA) must still produce a correctly quantized u1
    Zarr — a bare float write would truncate [0,1] to 0/1."""
    from biapy_tpu.config.config import get_cfg_defaults

    vol = np.full((24, 24, 24, 1), 0.5, np.float32)
    vol_path = str(tmp_path / "vol.zarr")
    z = ZarrArray.create(vol_path, shape=vol.shape, chunks=(12, 12, 12, 1),
                         dtype="f4", compressor={"id": "zlib", "level": 1})
    z[:, :, :, :] = vol

    class _HostWF:
        norm_spec = {"type": "none", "percentile_clip": False,
                     "out_dtype": "float32"}

        def __init__(self):
            cfg = get_cfg_defaults()
            cfg.merge_from_dict({"TEST": {"OUTPUT_QUANT_UINT8": True}})
            self.cfg = cfg

        def predict_block_on_device(self, block, **kw):
            return None  # force the host fallback

        def _predict_block_probs(self, block):
            return block

    wf = _HostWF()
    ci = ChunkedInference(wf, (12, 12, 12), (0, 0, 0), (2, 2, 2), (1, 1, 1),
                          1, str(tmp_path / "chunks"))
    # identity host predictor: reuse the engine's fallback hook by patching
    ci._predict_block = lambda block: block[..., :1]
    out_path = ci.predict_volume(vol_path, verbose=False)
    out = ZarrArray(out_path)
    assert str(out.dtype) in ("uint8", "u1", "|u1")
    vals = np.unique(np.asarray(out[:, :, :]))
    # 0.5 must quantize to 127/128, not truncate to 0
    assert set(int(v) for v in vals) <= {127, 128}, vals
