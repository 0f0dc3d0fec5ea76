"""DATA.PREPROCESS pipeline tests (reference: preprocess_data,
pre_processing.py:3872 and helpers :3657-3870)."""

import numpy as np
import pytest

from biapy_tpu.data.pre_processing import (
    apply_clahe,
    apply_gaussian_blur,
    apply_median_blur,
    detect_edges,
    match_histogram,
    resize_image,
)


def test_resize_up_down():
    rng = np.random.default_rng(0)
    img = (rng.random((40, 60, 1)) * 255).astype(np.uint8)
    up = resize_image(img, (80, 120))
    assert up.shape == (80, 120, 1) and up.dtype == np.uint8
    down = resize_image(img, (20, 30), anti_aliasing=True)
    assert down.shape == (20, 30, 1)
    # nearest-neighbour mask resize preserves the label set
    mask = np.zeros((40, 60, 1), np.uint8)
    mask[10:30, 10:40] = 7
    m2 = resize_image(mask, (20, 30), order=0)
    assert set(np.unique(m2)) <= {0, 7}


def test_blurs_preserve_shape_dtype():
    rng = np.random.default_rng(1)
    img = (rng.random((32, 32, 2)) * 255).astype(np.uint8)
    g = apply_gaussian_blur(img, sigma=2.0)
    m = apply_median_blur(img, (3, 3, 1))
    assert g.shape == img.shape and g.dtype == img.dtype
    assert m.shape == img.shape and m.dtype == img.dtype
    assert float(np.var(g[..., 0])) < float(np.var(img[..., 0]))


def test_match_histogram_moves_distribution():
    rng = np.random.default_rng(2)
    src = (rng.normal(50, 10, (64, 64, 1))).astype(np.float32)
    ref = (rng.normal(150, 30, (64, 64, 1))).astype(np.float32)
    out = match_histogram(src, ref)
    assert abs(float(out.mean()) - float(ref.mean())) < 5
    assert abs(float(out.std()) - float(ref.std())) < 5
    # monotonicity: ordering of pixels is preserved
    flat_s, flat_o = src.ravel(), out.ravel()
    order = np.argsort(flat_s)
    assert (np.diff(flat_o[order]) >= -1e-3).all()


def test_clahe_boosts_local_contrast():
    rng = np.random.default_rng(3)
    # low-contrast image: tiny dynamic range around 128
    img = (128 + 5 * rng.standard_normal((64, 64, 1))).clip(0, 255).astype(np.uint8)
    out = apply_clahe(img, kernel_size=(16, 16), clip_limit=0.05)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert float(out.std()) > 2 * float(img.std())
    # 3D stacks: per-slice
    vol = np.repeat(img[None], 4, axis=0)
    out3 = apply_clahe(vol, kernel_size=(16, 16), clip_limit=0.05)
    assert out3.shape == vol.shape


def test_canny_finds_square_edges():
    img = np.zeros((64, 64, 1), np.float32)
    img[16:48, 16:48] = 1.0
    edges = detect_edges(img, sigma=1.0)
    assert edges.shape == img.shape
    ys, xs = np.nonzero(edges[..., 0])
    assert len(ys) > 40  # a ring of edge pixels
    assert ys.min() >= 13 and ys.max() <= 50  # near the square boundary
    inner = edges[24:40, 24:40, 0]
    assert inner.sum() == 0  # no edges inside the flat region


def test_dataset_build_applies_resize(tmp_path):
    from biapy_tpu.data.io import save_tif
    from biapy_tpu.config.config import Config
    from biapy_tpu.data.data_manipulation import load_and_prepare_train_data

    rng = np.random.default_rng(4)
    root = str(tmp_path)
    import os

    os.makedirs(f"{root}/x"); os.makedirs(f"{root}/y")
    for i in range(4):
        save_tif((rng.random((40, 40, 1)) * 255).astype(np.uint8)[None], f"{root}/x",
                 [f"{i}.tif"], verbose=False)
        save_tif((rng.random((40, 40, 1)) > 0.5).astype(np.uint8)[None], f"{root}/y",
                 [f"{i}.tif"], verbose=False)
    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "PREPROCESS": {"TRAIN": True,
                                "RESIZE": {"ENABLE": True, "OUTPUT_SHAPE": (64, 64)}},
                 "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y"},
                 "VAL": {"SPLIT_TRAIN": 0.5}}})
    train, val = load_and_prepare_train_data(cfg)
    # resized 40x40 -> 64x64 gives a 2x2 grid of 32² patches per image
    f = train.dataset_info[0]
    assert tuple(f.shape[:2]) == (64, 64)
    s = train.sample_list[0]
    assert s.img.shape == (32, 32, 1)


def test_native_edt_matches_scipy():
    """First-party threaded FH EDT (native.edt, VERDICT r2 #7) is exact vs
    scipy.ndimage.distance_transform_edt on every call-site pattern."""
    from scipy import ndimage

    from biapy_tpu import native

    rng = np.random.default_rng(11)
    for shape in [(48,), (33, 47), (17, 29, 41)]:
        m = rng.random(shape) > 0.25
        np.testing.assert_allclose(
            native.edt(m), ndimage.distance_transform_edt(m).astype(np.float32),
            atol=1e-4)
        np.testing.assert_allclose(
            native.edt(~m), ndimage.distance_transform_edt(~m).astype(np.float32),
            atol=1e-4)
    # no-feature and all-feature degenerate lines
    m = np.ones((12, 12), bool)
    assert (native.edt(m) >= 1e29).all()
    m[3, 4] = False
    np.testing.assert_allclose(
        native.edt(m), ndimage.distance_transform_edt(m).astype(np.float32), atol=1e-4)
    # anisotropic sampling (reference `edt` dep supports it)
    m = rng.random((10, 20, 30)) > 0.1
    np.testing.assert_allclose(
        native.edt(m, sampling=(4.0, 1.0, 1.0)),
        ndimage.distance_transform_edt(m, sampling=(4.0, 1.0, 1.0)).astype(np.float32),
        rtol=1e-5, atol=1e-3)
