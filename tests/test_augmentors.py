"""Augmentor unit tests: properties every op must satisfy (shape/dtype
preservation, img/mask geometric consistency, determinism per rng key,
probability gating, mask untouched by intensity ops). The reference ships no
augmentor unit tests (SURVEY §4); the TPU build pins each op directly.
"""

import numpy as np
import pytest

from biapy_tpu.config.config import get_cfg_defaults
from biapy_tpu.data import augmentors as A


def _pair2d(seed=0, h=48, w=48, c=1):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w, c)).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    cy, cx = rng.integers(16, h - 16), rng.integers(16, w - 16)
    mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < 100).astype(np.float32)[..., None]
    return img, mask


def _pair3d(seed=0, z=6, h=32, w=32, c=1):
    rng = np.random.default_rng(seed)
    img = rng.random((z, h, w, c)).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
    disk = (((yy - cy) ** 2 + (xx - cx) ** 2) < 49).astype(np.float32)
    mask = np.repeat(disk[None, ..., None], z, 0)
    return img, mask


GEOMETRIC = [
    ("rot90", lambda i, m, r: A.rot90(i, m, r)),
    ("vflip", lambda i, m, r: A.flip(i, m, -3)),
    ("hflip", lambda i, m, r: A.flip(i, m, -2)),
    ("elastic", lambda i, m, r: A.elastic(i, m, r)),
    ("affine_rot", lambda i, m, r: A.affine_2d(i, m, r, rot_deg=33.0)),
    ("affine_zoom", lambda i, m, r: A.affine_2d(i, m, r, zoom=(1.3, 1.3))),
    ("affine_shear", lambda i, m, r: A.affine_2d(i, m, r, shear_deg=12.0)),
    ("affine_shift", lambda i, m, r: A.affine_2d(i, m, r, shift_frac=(0.1, -0.1))),
]

INTENSITY = [
    ("gaussian_blur", lambda i, r: A.gaussian_blur(i, r)),
    ("median_blur", lambda i, r: A.median_blur(i, r)),
    ("motion_blur", lambda i, r: A.motion_blur(i, r)),
    ("gamma_contrast", lambda i, r: A.gamma_contrast(i, r)),
    ("brightness", lambda i, r: A.brightness(i, r)),
    ("contrast", lambda i, r: A.contrast(i, r)),
    ("dropout", lambda i, r: A.dropout(i, r, (0.1, 0.2))),
    ("cutblur", lambda i, r: A.cutblur(i, r)),
    ("cutnoise", lambda i, r: A.cutnoise(i, r)),
    ("gridmask", lambda i, r: A.gridmask(i, r)),
    ("gaussian_noise", lambda i, r: A.gaussian_noise(i, r)),
    ("poisson_noise", lambda i, r: A.poisson_noise(i, r)),
    ("salt", lambda i, r: A.salt(i, r)),
    ("pepper", lambda i, r: A.pepper(i, r)),
    ("salt_and_pepper", lambda i, r: A.salt_and_pepper(i, r)),
    ("grayscale3c", lambda i, r: A.grayscale(np.repeat(i, 3, -1), r)),
    ("channel_shuffle", lambda i, r: A.channel_shuffle(np.repeat(i, 3, -1), r)),
]


@pytest.mark.parametrize("name,op", GEOMETRIC, ids=[n for n, _ in GEOMETRIC])
def test_geometric_img_mask_consistent_2d(name, op):
    """Applying a geometric op to (img, mask) where img IS the mask must
    keep them identical — img and mask move together."""
    _, mask = _pair2d(3)
    img = mask.copy()
    out_i, out_m = op(img, mask, np.random.default_rng(7))
    assert out_i.shape[-1] == img.shape[-1] and out_m.shape == mask.shape
    assert out_i.dtype == img.dtype
    # nearest-vs-linear interpolation differs only near edges; binarize
    assert np.mean((out_i > 0.5) != (out_m > 0.5)) < 0.02, name
    # determinism: same key -> same result
    i2, m2 = op(mask.copy(), mask, np.random.default_rng(7))
    assert np.array_equal(out_m, m2), name


@pytest.mark.parametrize("name,op", GEOMETRIC[:4], ids=[n for n, _ in GEOMETRIC[:4]])
def test_geometric_3d_slicewise(name, op):
    _, mask = _pair3d(4)
    img = mask.copy()
    out_i, out_m = op(img, mask, np.random.default_rng(11))
    assert out_i.shape == img.shape and out_m.shape == mask.shape
    assert np.mean((out_i > 0.5) != (out_m > 0.5)) < 0.02, name


@pytest.mark.parametrize("name,op", INTENSITY, ids=[n for n, _ in INTENSITY])
def test_intensity_ops_shape_dtype_determinism(name, op):
    img, _ = _pair2d(5)
    out = op(img.copy(), np.random.default_rng(13))
    assert out.shape[:2] == img.shape[:2], name
    assert out.dtype == img.dtype, name
    out2 = op(img.copy(), np.random.default_rng(13))
    assert np.array_equal(out, out2), f"{name} not deterministic per key"
    # 3D variant must work too
    img3, _ = _pair3d(5)
    c = 3 if name in ("grayscale3c", "channel_shuffle") else 1
    img3 = np.repeat(img3, c, -1) if c > 1 else img3
    out3 = op(img3[..., :1].copy(), np.random.default_rng(13)) if c > 1 \
        else op(img3.copy(), np.random.default_rng(13))
    assert out3.shape[:3] == img3.shape[:3], name


def test_cutout_masks_region():
    img, mask = _pair2d(6)
    out_i, out_m = A.cutout(img.copy(), mask.copy(), np.random.default_rng(3),
                            nb_iterations=(1, 1), size=(0.3, 0.3), cval=0.0,
                            apply_to_mask=False)
    assert (out_i == 0).sum() > (img == 0).sum()  # a region was zeroed
    assert np.array_equal(out_m, mask)  # mask untouched by default
    _, out_m2 = A.cutout(img.copy(), mask.copy(), np.random.default_rng(3),
                         nb_iterations=(1, 1), size=(0.3, 0.3), cval=0.0,
                         apply_to_mask=True)
    assert not np.array_equal(out_m2, mask)


def test_cutmix_swaps_regions():
    a_img, a_mask = _pair2d(7)
    b_img, b_mask = _pair2d(8)
    oa, ma = A.cutmix(a_img.copy(), b_img.copy(), a_mask.copy(), b_mask.copy(),
                      np.random.default_rng(5), size=(0.3, 0.3))
    assert oa.shape == a_img.shape
    assert not np.array_equal(oa, a_img)  # something was pasted
    # pasted pixels come from b
    changed = ~np.isclose(oa, a_img)
    assert np.allclose(oa[changed], b_img[changed])


def test_misalignment_and_missing_sections_3d():
    img, mask = _pair3d(9, z=8)
    oi, om = A.misalignment(img.copy(), mask.copy(), np.random.default_rng(2),
                            displacement=4, rotate_ratio=0.0)
    assert oi.shape == img.shape and om.shape == mask.shape
    out = A.missing_sections(img.copy(), np.random.default_rng(2),
                             iterations=(2, 4), channel_prob=0.5)
    assert out.shape == img.shape


def test_zoom_3d_z_changes_z_content():
    img, mask = _pair3d(10, z=10)
    oi, om = A.zoom_3d_z(img.copy(), mask.copy(), np.random.default_rng(4),
                         zoom_range=(1.5, 1.5))
    assert oi.shape == img.shape and om.shape == mask.shape


def test_pipeline_probability_gating_and_determinism():
    cfg = get_cfg_defaults()
    cfg.merge_from_dict({"AUGMENTOR": {"ENABLE": True, "VFLIP": True, "HFLIP": True,
                                       "ROT90": True, "GAUSSIAN_NOISE": True}})
    pipe = A.AugmentorPipeline(cfg, ndim=2)
    img, mask = _pair2d(11)
    o1 = pipe(img.copy(), mask.copy(), np.random.default_rng(42))
    o2 = pipe(img.copy(), mask.copy(), np.random.default_rng(42))
    assert np.array_equal(o1[0], o2[0]) and np.array_equal(o1[1], o2[1])
    # all probabilities zero -> identity
    cfg2 = get_cfg_defaults()
    cfg2.merge_from_dict({"AUGMENTOR": {"ENABLE": True, "VFLIP": True, "VFLIP_PROB": 0.0,
                                        "GAUSSIAN_NOISE": True, "GAUSSIAN_NOISE_PROB": 0.0}})
    pipe2 = A.AugmentorPipeline(cfg2, ndim=2)
    i3, m3 = pipe2(img.copy(), mask.copy(), np.random.default_rng(1))
    assert np.array_equal(i3, img) and np.array_equal(m3, mask)
