import os

import numpy as np
import pytest

from biapy_tpu.data.io import ensure_channels_last, imread, imwrite, read_img_as_ndarray
from biapy_tpu.data.norm import denormalize, normalize_image, normalize_mask
from biapy_tpu.data.patching import (
    compute_patch_grid,
    crop_data_with_overlap,
    merge_data_with_overlap,
    pad_to_min_shape,
    spline_window_1d,
)
from biapy_tpu.data.tiff import read_tiff, write_tiff
from biapy_tpu.data.zarr_store import ZarrArray, open_zarr

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------- TIFF / IO
@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((37, 53), np.uint8),
        ((64, 48), np.uint16),
        ((33, 41), np.float32),
        ((40, 50, 3), np.uint8),
        ((7, 32, 32), np.uint8),
        ((5, 16, 24), np.float32),
        ((4, 16, 16, 2), np.uint16),
        ((3, 8, 8, 12), np.float32),
    ],
)
def test_tiff_roundtrip(tmp_path, shape, dtype):
    arr = (RNG.random(shape) * 100).astype(dtype)
    p = str(tmp_path / "x.tif")
    write_tiff(p, arr)
    back = read_tiff(p)
    assert np.array_equal(np.squeeze(arr), np.squeeze(back))


def test_io_dispatch_h5_zarr_npy(tmp_path):
    arr = RNG.random((10, 20, 30)).astype(np.float32)
    for ext in (".h5", ".zarr", ".npy", ".tif"):
        p = str(tmp_path / ("x" + ext))
        imwrite(p, arr)
        assert np.allclose(imread(p), arr)


def test_read_img_as_ndarray_channels_last(tmp_path):
    arr = RNG.integers(0, 255, (40, 50)).astype(np.uint8)
    p = str(tmp_path / "img.tif")
    write_tiff(p, arr)
    img = read_img_as_ndarray(p, is_3d=False)
    assert img.shape == (40, 50, 1)
    vol = RNG.integers(0, 255, (8, 16, 16)).astype(np.uint8)
    p2 = str(tmp_path / "vol.tif")
    write_tiff(p2, vol)
    v = read_img_as_ndarray(p2, is_3d=True)
    assert v.shape == (8, 16, 16, 1)


def test_ensure_channels_last_axes_order():
    x = RNG.random((3, 10, 20, 30)).astype(np.float32)  # CZYX
    out = ensure_channels_last(x, ndim=3, axes_order="CZYX")
    assert out.shape == (10, 20, 30, 3)
    assert np.array_equal(out[..., 1], x[1])


# ---------------------------------------------------------------- Zarr store
def test_zarr_roundtrip_and_partial(tmp_path):
    p = str(tmp_path / "a.zarr")
    arr = ZarrArray.create(p, shape=(50, 60, 7), chunks=(16, 16, 4), dtype="f4",
                           compressor={"id": "zlib", "level": 1})
    data = RNG.random((50, 60, 7)).astype(np.float32)
    arr[:, :, :] = data
    re = open_zarr(p)
    assert re.shape == (50, 60, 7)
    assert np.array_equal(re[:, :, :], data)
    assert np.array_equal(re[10:30, 5:50, 2:6], data[10:30, 5:50, 2:6])
    assert np.array_equal(re[3], data[3])
    # partial write into existing chunks
    w = open_zarr(p, mode="r+")
    patch = RNG.random((8, 9, 3)).astype(np.float32)
    w[20:28, 30:39, 1:4] = patch
    data[20:28, 30:39, 1:4] = patch
    assert np.array_equal(open_zarr(p)[:, :, :], data)


def test_zarr_fill_value(tmp_path):
    p = str(tmp_path / "b.zarr")
    arr = ZarrArray.create(p, shape=(10, 10), chunks=(4, 4), dtype="i4", fill_value=7)
    assert np.all(arr[0:10, 0:10] == 7)


# ---------------------------------------------------------------- Normalization
def test_norm_div_roundtrip():
    img = RNG.integers(0, 255, (32, 32, 1)).astype(np.uint8)
    out, stats = normalize_image(img, {"type": "div", "percentile_clip": False, "out_dtype": "float32"})
    assert out.max() <= 1.0 and out.dtype == np.float32
    back = denormalize(out, stats)
    assert back.dtype == np.uint8
    assert np.array_equal(back, img)


def test_norm_scale_range():
    img = (RNG.random((16, 16, 2)) * 1000 + 500).astype(np.float32)
    out, stats = normalize_image(img, {"type": "scale_range", "percentile_clip": False, "out_dtype": "float32"})
    assert abs(float(out.min())) < 1e-5 and abs(float(out.max()) - 1) < 1e-5
    back = denormalize(out, stats)
    assert np.allclose(back, img, atol=1e-2)


def test_norm_zmuv_and_reuse():
    img = RNG.random((16, 16, 1)).astype(np.float32) * 50
    out, stats = normalize_image(img, {"type": "zero_mean_unit_var", "percentile_clip": False, "out_dtype": "float32"})
    assert abs(float(out.mean())) < 1e-4
    # stats reuse: another patch normalized with same stats uses same mean
    patch = img[:8, :8]
    out2, _ = normalize_image(patch, {"type": "zero_mean_unit_var", "percentile_clip": False, "out_dtype": "float32"}, stats=stats)
    expected = (patch - stats["channels"][0]["mean"]) / stats["channels"][0]["std"]
    assert np.allclose(out2, expected, atol=1e-5)


def test_norm_bfloat16_out_dtype():
    # TEST.REDUCE_MEMORY plumbs out_dtype=bfloat16 into the test norm spec so
    # by-chunks blocks ship half-width over H2D (ref base_workflow.py:181)
    import ml_dtypes

    img = RNG.integers(0, 255, (16, 16, 1)).astype(np.uint8)
    out, stats = normalize_image(img, {"type": "div", "percentile_clip": False, "out_dtype": "bfloat16"})
    assert out.dtype == np.dtype(ml_dtypes.bfloat16)
    assert float(np.asarray(out, np.float32).max()) <= 1.0
    # stats are float32 and denormalize recovers within bf16 precision
    back = denormalize(out, stats)
    assert back.dtype == np.uint8
    assert np.abs(back.astype(np.int32) - img.astype(np.int32)).max() <= 1


def test_norm_percentile_clip():
    img = np.concatenate([np.zeros((99, 1, 1)), np.full((1, 1, 1), 1e6)]).astype(np.float32)
    out, stats = normalize_image(
        img,
        {"type": "scale_range", "percentile_clip": True, "lower_perc": 2, "upper_perc": 98,
         "lower_value": None, "upper_value": None, "out_dtype": "float32"},
    )
    assert stats["channels"][0]["clip_high"] < 1e6


@pytest.mark.parametrize("ntype", ["div", "scale_range", "zero_mean_unit_var"])
@pytest.mark.parametrize("clip", [False, True])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_compute_norm_stats_matches_normalize_image(ntype, clip, dtype):
    """The raw-bytes stats pass (device-side normalization, by-chunks path)
    must produce the exact stats normalize_image computes on the float copy,
    and applying the flattened affine must reproduce normalize_image's
    values (so shipping raw + on-device clip/affine is numerically the
    host-normalized block)."""
    from biapy_tpu.data.norm import compute_norm_stats, stats_to_affine

    rng = np.random.default_rng(3)
    hi = 255 if dtype == np.uint8 else 60000
    img = rng.integers(0, hi, (20, 24, 2)).astype(dtype)
    spec = {"type": ntype, "percentile_clip": clip, "out_dtype": "float32"}
    if clip:
        spec.update({"lower_perc": 2.0, "upper_perc": 98.0,
                     "lower_value": None, "upper_value": None})

    ref_out, ref_stats = normalize_image(img, spec)
    stats = compute_norm_stats(img, spec)
    for cs, rs in zip(stats["channels"], ref_stats["channels"]):
        assert set(cs) == set(rs)
        for k in cs:
            np.testing.assert_allclose(cs[k], rs[k], rtol=1e-5, atol=1e-5)

    # reusing the raw-pass stats in normalize_image reproduces the block
    out2, _ = normalize_image(img, spec, stats=stats)
    np.testing.assert_allclose(out2, ref_out, rtol=1e-5, atol=1e-6)

    # the flattened affine IS the value transform
    lo, hi_a, sub, div = stats_to_affine(stats)
    man = (np.clip(img.astype(np.float32), lo, hi_a) - sub) / div
    np.testing.assert_allclose(man, ref_out, rtol=1e-5, atol=1e-6)


def test_normalize_mask():
    m = np.zeros((8, 8, 1), dtype=np.uint8)
    m[2:4] = 255
    out = normalize_mask(m)
    assert set(np.unique(out)) == {0.0, 1.0}


# ---------------------------------------------------------------- Patching
def test_grid_matches_reference_docstring_examples():
    # reference: data_2D_manipulation.py crop_data_with_overlap docstring
    for ov, expected in [((0, 0), (3, 4)), ((0.25, 0.25), (4, 6)), ((0.5, 0.5), (6, 8)), ((0.5, 0), (6, 4))]:
        _, grids = compute_patch_grid((768, 1024), (256, 256), ov, (0, 0))
        assert tuple(g.n for g in grids) == expected


@pytest.mark.parametrize("ov,pad", [((0, 0), (0, 0)), ((0.3, 0.3), (8, 8)), ((0.5, 0.1), (0, 16))])
def test_crop_merge_roundtrip_2d(ov, pad):
    img = RNG.random((3, 100, 120, 2)).astype(np.float32)
    p, coords = crop_data_with_overlap(img, (64, 64, 2), overlap=ov, padding=pad)
    back = merge_data_with_overlap(p, img.shape, overlap=ov, padding=pad)
    assert np.allclose(back, img, atol=1e-5)


def test_crop_merge_roundtrip_3d():
    vol = RNG.random((1, 40, 80, 90, 1)).astype(np.float32)
    p, _ = crop_data_with_overlap(vol, (32, 64, 64, 1), overlap=(0.1, 0.2, 0.2), padding=(4, 8, 8))
    back = merge_data_with_overlap(p, vol.shape, overlap=(0.1, 0.2, 0.2), padding=(4, 8, 8))
    assert np.allclose(back, vol, atol=1e-5)


def test_spline_window_taper():
    w = spline_window_1d(64, 16)
    assert w[0] < 0.05 and abs(w[32] - 1) < 1e-6 and w[-1] < 0.05
    assert np.allclose(w, w[::-1])


def test_pad_to_min_shape():
    img = RNG.random((20, 30, 1)).astype(np.float32)
    out, pads = pad_to_min_shape(img, (64, 64))
    assert out.shape[:2] == (64, 64)


# ----------------------------------------------------- reference golden parity
def _load_ref(relpath, name):
    import os
    here = os.path.dirname(__file__)
    ns = {}
    exec(open(os.path.join(here, "_reference_loader.py")).read(), ns)
    return ns["load_ref"](relpath, name)


@pytest.mark.skipif(not __import__("os").path.exists("/root/reference"), reason="reference not mounted")
def test_crop_merge_bit_exact_vs_reference_2d():
    try:
        m = _load_ref("biapy/data/data_2D_manipulation.py", "ref_d2m")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module failed to load: {e}")
    img = RNG.random((2, 300, 250, 1)).astype(np.float32)
    for ov, pad in [((0, 0), (0, 0)), ((0.25, 0.1), (16, 16)), ((0.5, 0.5), (0, 0))]:
        rp, _ = m.crop_data_with_overlap(img, (128, 128, 1), overlap=ov, padding=pad, verbose=False)
        mp, _ = crop_data_with_overlap(img, (128, 128, 1), overlap=ov, padding=pad)
        assert np.array_equal(rp, mp)
        rm = m.merge_data_with_overlap(rp, img.shape, overlap=ov, padding=pad, verbose=False)
        mm = merge_data_with_overlap(mp, img.shape, overlap=ov, padding=pad)
        assert np.abs(np.asarray(rm, dtype=np.float64) - mm).max() == 0.0


# ------------------------------------------------------- lazy Zarr training
def test_lazy_zarr_multiple_data_training_pipeline(tmp_path):
    """Train data streamed lazily from a single Zarr holding raw+GT
    (reference: DATA.*.INPUT_ZARR_MULTIPLE_DATA, samples_from_zarr)."""
    from biapy_tpu.config.config import Config, update_dependencies
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.generators import PairDataset
    from biapy_tpu.data.zarr_store import ZarrGroup

    d = tmp_path / "train_zarr"
    d.mkdir()
    vol = np.zeros((12, 64, 64), np.float32)
    vol[:, 16:48, 16:48] = 1.0
    lab = (vol > 0.5).astype(np.uint8)
    g = ZarrGroup.create(str(d / "vol.zarr"))
    a = g.create_dataset("volumes/raw", shape=vol.shape, chunks=(4, 32, 32), dtype="float32")
    a[:, :, :] = vol
    b = g.create_dataset("volumes/labels", shape=lab.shape, chunks=(4, 32, 32), dtype="uint8")
    b[:, :, :] = lab

    c = Config(str(tmp_path), "lazyjob")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"},
        "DATA": {
            "PATCH_SIZE": (4, 32, 32, 1),
            "TRAIN": {"PATH": str(d), "IN_MEMORY": False,
                      "INPUT_ZARR_MULTIPLE_DATA": True,
                      "INPUT_ZARR_MULTIPLE_DATA_RAW_PATH": "volumes.raw",
                      "INPUT_ZARR_MULTIPLE_DATA_GT_PATH": "volumes.labels",
                      "INPUT_IMG_AXES_ORDER": "ZYX"},
            "VAL": {"SPLIT_TRAIN": 0.25},
        },
    })
    update_dependencies(cfg, str(tmp_path), "lazyjob")
    train, val = load_and_prepare_train_data(cfg, norm_spec={"type": "div"})
    # 12/4 x 64/32 x 64/32 = 12 patches, split 25% val
    assert len(train) + len(val) == 12
    assert all(s.img is None for s in train.sample_list), "lazy samples must not hold pixels"

    gen = PairDataset(train, cfg, norm_spec={"type": "div"}, augment=False)
    rng = np.random.default_rng(0)
    item = gen.get(0, rng)
    assert item["x"].shape == (4, 32, 32, 1)
    assert item["y"].shape == (4, 32, 32, 1)
    assert set(np.unique(item["y"])).issubset({0.0, 1.0})


# ----------------------------------------------------------------- NIfTI
@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize("shape,dtype", [((7, 24, 20), np.float32),
                                         ((16, 16), np.uint16),
                                         ((5, 12, 10, 2), np.int16)])
def test_nifti_roundtrip(tmp_path, ext, shape, dtype):
    arr = (RNG.random(shape) * 100).astype(dtype)
    p = str(tmp_path / ("vol" + ext))
    imwrite(p, arr)
    back = imread(p)
    assert back.shape == arr.shape
    assert np.array_equal(back, arr)


def test_probability_map_weighted_random_crop(tmp_path):
    """DATA.TRAIN.PROBABILITY_MAP biases random crops toward foreground
    (reference: calculate_volume_prob_map, pre_processing.py:3524)."""
    import os

    from biapy_tpu.config.config import Config
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.generators import PairDataset
    from biapy_tpu.data.io import save_tif

    rng = np.random.default_rng(6)
    root = str(tmp_path)
    os.makedirs(f"{root}/x"); os.makedirs(f"{root}/y")
    img = (rng.random((128, 128, 1)) * 255).astype(np.uint8)
    msk = np.zeros((128, 128, 1), np.uint8)
    msk[100:120, 100:120] = 1  # tiny fg blob in one corner
    for i in range(2):
        save_tif(img[None], f"{root}/x", [f"{i}.tif"], verbose=False)
        save_tif(msk[None], f"{root}/y", [f"{i}.tif"], verbose=False)

    def crops(prob_map):
        c = Config(".", "t")
        cfg = c.get_cfg_defaults()
        cfg.merge_from_dict({
            "DATA": {"PATCH_SIZE": (32, 32, 1),
                     "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y",
                               "EXTRACT_RANDOM_PATCH": True,
                               "PROBABILITY_MAP": prob_map},
                     "VAL": {"SPLIT_TRAIN": 0.5}},
            "AUGMENTOR": {"ENABLE": False}})
        train, _ = load_and_prepare_train_data(cfg)
        pd = PairDataset(train, cfg, {"type": "div"}, augment=True, random_crop=True)
        r = np.random.default_rng(0)
        hits = 0
        for k in range(40):
            out = pd.get(0, r)
            hits += int(out["y"].max() > 0)
        return hits

    weighted = crops(True)
    uniform = crops(False)
    assert weighted >= 30, f"weighted crops should almost always contain fg ({weighted}/40)"
    assert uniform < 25, f"uniform crops should mostly miss the tiny blob ({uniform}/40)"


def test_multiple_raw_one_target_loader(tmp_path):
    """PROBLEM.IMAGE_TO_IMAGE.MULTIPLE_RAW_ONE_TARGET_LOADER: every raw in a
    scene subfolder pairs with the scene's single target (reference:
    data_manipulation.py:306, the LightMyCells layout)."""
    import os

    from biapy_tpu.config.config import Config
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.io import save_tif

    rng = np.random.default_rng(8)
    root = str(tmp_path)
    for scene in ("s1", "s2"):
        os.makedirs(f"{root}/x/{scene}"); os.makedirs(f"{root}/y/{scene}")
        for i in range(3):
            save_tif((rng.random((32, 32, 1)) * 255).astype(np.uint8)[None],
                     f"{root}/x/{scene}", [f"raw{i}.tif"], verbose=False)
        save_tif((rng.random((32, 32, 1)) * 255).astype(np.uint8)[None],
                 f"{root}/y/{scene}", ["target.tif"], verbose=False)

    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "IMAGE_TO_IMAGE", "NDIM": "2D",
                    "IMAGE_TO_IMAGE": {"MULTIPLE_RAW_ONE_TARGET_LOADER": True}},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y"},
                 "VAL": {"SPLIT_TRAIN": 0.34}}})
    train, val = load_and_prepare_train_data(cfg, gt_is_mask=False)
    n = len(train.sample_list) + len(val.sample_list)
    assert n == 6  # 2 scenes x 3 raws, each paired with its scene target
    gts = {train.dataset_info[s.fid].gt_path for s in train.sample_list}
    for g in gts:
        assert g is not None and g.endswith("target.tif")


def test_replicate_extra_data_factor(tmp_path):
    """DATA.TRAIN.REPLICATE walks the dataset N times per epoch with fresh
    augmentation draws per replica (reference extra_data_factor,
    generators/__init__.py:301)."""
    import os

    from biapy_tpu.config.config import Config
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.generators import BatchLoader, PairDataset
    from biapy_tpu.data.io import save_tif

    rng = np.random.default_rng(9)
    root = str(tmp_path)
    os.makedirs(f"{root}/x"); os.makedirs(f"{root}/y")
    for i in range(4):
        save_tif((rng.random((64, 64, 1)) * 255).astype(np.uint8)[None], f"{root}/x",
                 [f"{i}.tif"], verbose=False)
        save_tif((rng.random((64, 64, 1)) > 0.5).astype(np.uint8)[None], f"{root}/y",
                 [f"{i}.tif"], verbose=False)
    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y",
                           "EXTRACT_RANDOM_PATCH": True},
                 "VAL": {"SPLIT_TRAIN": 0.25}},
        "AUGMENTOR": {"ENABLE": False}})
    train, _ = load_and_prepare_train_data(cfg)
    pd = PairDataset(train, cfg, {"type": "div"}, augment=True, random_crop=True)
    base = BatchLoader(pd, 1, shuffle=False, prefetch=0)
    rep = BatchLoader(pd, 1, shuffle=False, prefetch=0, replicate=3)
    assert len(rep) == 3 * len(base)
    batches = [b["x"] for b in rep]
    assert len(batches) == 3 * len(base)
    # replicas of the same sample must differ (fresh random crop per replica)
    n = len(base)
    assert not np.array_equal(batches[0], batches[n])


def test_filter_by_image_and_norm_before(tmp_path):
    """DATA.FILTER_BY_IMAGE drops every patch of a failing file together;
    FILTER_SAMPLES.NORM_BEFORE measures after normalization (reference:
    data_manipulation.py:112-113)."""
    import os

    from biapy_tpu.config.config import Config
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.io import save_tif

    root = str(tmp_path)
    os.makedirs(f"{root}/x"); os.makedirs(f"{root}/y")
    rng = np.random.default_rng(10)
    # file 0: dark image (mean ~20); file 1: bright (mean ~200)
    for i, base in enumerate([20, 200]):
        img = (base + rng.normal(0, 3, (64, 64, 1))).clip(0, 255).astype(np.uint8)
        save_tif(img[None], f"{root}/x", [f"{i}.tif"], verbose=False)
        save_tif((img > base).astype(np.uint8)[None], f"{root}/y", [f"{i}.tif"], verbose=False)

    def build(**data_over):
        c = Config(".", "t")
        cfg = c.get_cfg_defaults()
        cfg.merge_from_dict({"DATA": {
            "PATCH_SIZE": (32, 32, 1),
            "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y",
                      "FILTER_SAMPLES": {"ENABLE": True, "PROPS": [["mean"]],
                                         "VALUES": [[100]], "SIGNS": [["lt"]],
                                         **data_over.pop("FS", {})}},
            "VAL": {"SPLIT_TRAIN": 0.01, "FROM_TRAIN": False,
                    "PATH": f"{root}/x", "GT_PATH": f"{root}/y"},
            **data_over}})
        return cfg

    # by-image: file 0 (mean<100) fully dropped -> only file 1's 4 patches
    train, _ = load_and_prepare_train_data(build(FILTER_BY_IMAGE=True))
    assert len(train.sample_list) == 4
    assert all(train.dataset_info[s.fid].path.endswith("1.tif") for s in train.sample_list)

    # NORM_BEFORE with div normalization: means become <=1, so EVERY sample
    # matches 'mean < 100' -> all filtered -> error
    import pytest

    with pytest.raises(ValueError, match="filtered out"):
        load_and_prepare_train_data(build(FS={"NORM_BEFORE": True}),
                                    norm_spec={"type": "div"})


def test_n5_store_roundtrip(tmp_path):
    """N5 read/write: reversed dimension order, nested chunk paths,
    big-endian headered blocks, gzip compression (reference reads N5 via
    zarr's N5 store; SURVEY §2.5)."""
    from biapy_tpu.data.zarr_store import N5Array, N5Group, open_zarr

    rng = np.random.default_rng(0)
    data = rng.integers(0, 1000, (5, 7, 11)).astype(np.uint16)
    root = str(tmp_path / "vol.n5")
    g = N5Group.create(root)
    arr = g.create_dataset("volumes/raw", shape=data.shape, chunks=(2, 3, 4),
                           dtype=np.uint16, compression="gzip")
    arr[:, :, :] = data

    # on-disk layout: reversed dims in attributes.json, nested x/y/z paths
    import json as _json
    meta = _json.load(open(os.path.join(root, "volumes/raw/attributes.json")))
    assert meta["dimensions"] == [11, 7, 5] and meta["blockSize"] == [4, 3, 2]
    assert os.path.exists(os.path.join(root, "volumes/raw/0/0/0"))

    back = open_zarr(root)["volumes/raw"]
    assert isinstance(back, N5Array)
    assert back.shape == data.shape
    assert np.array_equal(np.asarray(back), data)
    assert np.array_equal(back[1:4, 2:6, 3:9], data[1:4, 2:6, 3:9])

    # hand-built raw block pins the binary format independent of our writer
    raw_root = str(tmp_path / "hand.n5")
    os.makedirs(os.path.join(raw_root, "0"))
    _json.dump({"dimensions": [3, 2], "blockSize": [3, 2], "dataType": "uint8",
                "compression": {"type": "raw"}},
               open(os.path.join(raw_root, "attributes.json"), "w"))
    # block: mode=0, ndim=2, dims (3,2) big-endian, payload x-fastest
    blob = (0).to_bytes(2, "big") + (2).to_bytes(2, "big") \
        + (3).to_bytes(4, "big") + (2).to_bytes(4, "big") \
        + bytes([1, 2, 3, 4, 5, 6])
    with open(os.path.join(raw_root, "0/0"), "wb") as f:
        f.write(blob)
    hand = open_zarr(raw_root)
    assert hand.shape == (2, 3)  # numpy order = reversed(dimensions)
    assert np.array_equal(np.asarray(hand), [[1, 2, 3], [4, 5, 6]])


def test_n5_streams_through_open_lazy(tmp_path):
    from biapy_tpu.data.io import open_lazy
    from biapy_tpu.data.zarr_store import N5Group

    data = np.arange(4 * 6 * 6, dtype=np.float32).reshape(4, 6, 6)
    root = str(tmp_path / "vol.n5")
    g = N5Group.create(root)
    arr = g.create_dataset("volumes/raw", shape=data.shape, chunks=(2, 3, 3),
                           dtype=np.float32)
    arr[:, :, :] = data
    lazy, handle = open_lazy(root, data_path="volumes.raw")
    assert np.allclose(lazy[1:3, 0:4, 2:5], data[1:3, 0:4, 2:5])


# --------------------------------------------------- disk-backed geometry
def _sr_pair_dirs(tmp_path, n=3, lr=32, up=2):
    from biapy_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(4)
    xd, yd = tmp_path / "x", tmp_path / "y"
    xd.mkdir(), yd.mkdir()
    for i in range(n):
        lo = rng.integers(0, 255, (lr, lr), np.uint8)
        hi = np.kron(lo, np.ones((up, up), np.uint8))  # exact HR version
        write_tiff(str(xd / f"{i}.tif"), lo)
        write_tiff(str(yd / f"{i}.tif"), hi)
    return str(xd), str(yd)


def test_disk_backed_sr_gt_patch_alignment(tmp_path):
    """IN_MEMORY=False with y_upscaling: the GT patch must be read at the
    UPSCALED coordinates — unscaled coords silently selected the wrong HR
    region (and the wrong size). The disk-backed sample must equal the
    in-memory one exactly."""
    from biapy_tpu.config.config import Config, update_dependencies
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.generators import PairDataset

    xd, yd = _sr_pair_dirs(tmp_path)

    def build(in_memory):
        c = Config(str(tmp_path), "sr")
        cfg = c.get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "SUPER_RESOLUTION", "NDIM": "2D",
                        "SUPER_RESOLUTION": {"UPSCALING": (2, 2)}},
            "DATA": {"PATCH_SIZE": (16, 16, 1),
                     "NORMALIZATION": {"TYPE": "div"},
                     "TRAIN": {"PATH": xd, "GT_PATH": yd, "IN_MEMORY": in_memory},
                     "VAL": {"SPLIT_TRAIN": 0.25}},
        })
        update_dependencies(cfg, str(tmp_path), "sr")
        train, _ = load_and_prepare_train_data(cfg, norm_spec={"type": "div"},
                                               y_upscaling=(2, 2), gt_is_mask=False)
        return PairDataset(train, cfg, {"type": "div"}, augment=False,
                           y_upscaling=(2, 2), gt_as_image=True)

    mem, disk = build(True), build(False)
    rng = np.random.default_rng(0)
    for i in range(len(mem)):
        a = mem.get(i, np.random.default_rng(1))
        b = disk.get(i, np.random.default_rng(1))
        assert b["y"].shape == (32, 32, 1), b["y"].shape
        np.testing.assert_allclose(a["x"], b["x"], atol=1e-6)
        np.testing.assert_allclose(a["y"], b["y"], atol=1e-6)


def test_disk_backed_small_image_random_crop(tmp_path):
    """EXTRACT_RANDOM_PATCH with IN_MEMORY=False and an image smaller than
    the patch: the reflect pad applied at dataset build must be re-applied
    at load, else the crop comes out undersized."""
    from biapy_tpu.config.config import Config, update_dependencies
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data
    from biapy_tpu.data.generators import PairDataset
    from biapy_tpu.data.tiff import write_tiff

    xd, yd = tmp_path / "x", tmp_path / "y"
    xd.mkdir(), yd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (20, 20), np.uint8)
        write_tiff(str(xd / f"{i}.tif"), img)
        write_tiff(str(yd / f"{i}.tif"), (img > 128).astype(np.uint8))
    c = Config(str(tmp_path), "rc")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": str(xd), "GT_PATH": str(yd),
                           "IN_MEMORY": False, "EXTRACT_RANDOM_PATCH": True},
                 "VAL": {"SPLIT_TRAIN": 0.25}},
    })
    update_dependencies(cfg, str(tmp_path), "rc")
    train, _ = load_and_prepare_train_data(cfg, norm_spec={"type": "div"})
    pd = PairDataset(train, cfg, {"type": "div"}, augment=False, random_crop=True)
    item = pd.get(0, np.random.default_rng(3))
    assert item["x"].shape == (32, 32, 1), item["x"].shape
    assert item["y"].shape == (32, 32, 1), item["y"].shape


def test_loader_propagates_producer_errors(tmp_path):
    """An exception on the prefetch thread must surface in the training
    loop, not silently truncate the epoch."""
    from biapy_tpu.data.generators import BatchLoader

    class Bad:
        def __len__(self):
            return 8

        def get(self, idx, rng):
            if idx >= 4:
                raise RuntimeError("corrupt sample")
            return {"x": np.zeros((4, 4, 1), np.float32)}

    loader = BatchLoader(Bad(), 2, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for _ in loader:
            pass


def test_filter_samples_target_props(tmp_path):
    """target_mean/target_min/target_max and the diff family are measurable
    (a validated config crashed with KeyError before)."""
    from biapy_tpu.data.data_manipulation import _sample_props

    img = np.full((8, 8, 1), 2.0, np.float32)
    gt = np.full((8, 8, 1), 5.0, np.float32)
    p = _sample_props(img, gt)
    assert p["target_mean"] == 5.0 and p["target_min"] == 5.0
    assert p["diff"] == 3.0 * 64
    # reference formula: L1 * intensity range
    assert p["diff_by_min_max_ratio"] == p["diff"] * 0.0


def test_axis_grid_extreme_overlap():
    """overlap -> 1 truncates the stride to 0; the grid must clamp to a
    1-pixel stride instead of ZeroDivisionError."""
    from biapy_tpu.data.patching import axis_grid

    g = axis_grid(128, 64, 0.995, 0)
    assert g.n >= 1 and g.start(1) - g.start(0) == 1


def test_stratified_kfold_classification_split():
    """Classification k-fold stratifies by class_num so an imbalanced label
    set keeps its class ratio in every fold (reference: StratifiedKFold,
    data_manipulation.py:1606)."""
    from biapy_tpu.data.data_manipulation import split_train_val
    from biapy_tpu.data.dataset import BiaPyDataset, DataSample, DatasetFile

    # 40 samples of class 0, 10 of class 1 (4:1 imbalance)
    ds = BiaPyDataset()
    for i in range(50):
        c = 0 if i < 40 else 1
        ds.dataset_info.append(DatasetFile(path=f"img{i}.tif", class_num=c))
        ds.sample_list.append(DataSample(fid=i))

    for fold in range(1, 6):
        _, val = split_train_val(ds, 0.0, seed=42, cross_val=True,
                                 cross_val_nsplits=5, cross_val_fold=fold,
                                 stratify_by_class=True)
        counts = {0: 0, 1: 0}
        for s in val.sample_list:
            counts[val.dataset_info[s.fid].class_num] += 1
        # every fold of 10 must hold exactly 8 class-0 and 2 class-1 samples
        assert counts == {0: 8, 1: 2}, counts

    # folds must partition the sample set (disjoint, covering)
    seen = set()
    for fold in range(1, 6):
        _, val = split_train_val(ds, 0.0, seed=42, cross_val=True,
                                 cross_val_nsplits=5, cross_val_fold=fold,
                                 stratify_by_class=True)
        ids = {id(s) for s in val.sample_list}
        assert not (seen & ids)
        seen |= ids
    assert len(seen) == 50

    # unstratified path still works for unlabeled datasets
    ds2 = BiaPyDataset()
    for i in range(10):
        ds2.dataset_info.append(DatasetFile(path=f"u{i}.tif"))
        ds2.sample_list.append(DataSample(fid=i))
    tr, va = split_train_val(ds2, 0.0, seed=0, cross_val=True,
                             cross_val_nsplits=5, cross_val_fold=1,
                             stratify_by_class=True)
    assert len(va) == 2 and len(tr) == 8
