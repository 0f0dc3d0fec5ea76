"""Representation-aware TRAIN-time augmentation oracle (VERDICT r2 #3).

The invariant, per channel family: augment-labels-then-compile ==
compile-then-augment. For orthogonal transforms (flips / rot90) the exact
TTA-group remap must reproduce it; for resampling transforms (affine) the
regeneration path must. Reference analog: the flow-vector transforms
(biapy/data/generators/augmentors.py:1892-2026) and the per-batch channel
regeneration (pair_base_data_generator.py:1567-1579).
"""

import numpy as np
import pytest

from biapy_tpu.data import augmentors as A
from biapy_tpu.data.pre_processing import labels_into_channels
from biapy_tpu.data.tta import (
    GEOMETRY_CODES,
    build_train_channel_handler,
    flip_transform,
    rot90_transform,
)


def _labels2d(seed=0, h=48, w=48, n=4):
    rng = np.random.default_rng(seed)
    lab = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[:h, :w]
    for i in range(1, n + 1):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        r = int(rng.integers(4, 7))
        lab[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = i
    return lab[..., None]


def _labels3d(seed=0, z=12, h=32, w=32, n=3):
    rng = np.random.default_rng(seed)
    lab = np.zeros((z, h, w), np.int32)
    zz, yy, xx = np.mgrid[:z, :h, :w]
    for i in range(1, n + 1):
        cz, cy, cx = rng.integers(3, z - 3), rng.integers(8, h - 8), rng.integers(8, w - 8)
        r = int(rng.integers(3, 5))
        m = ((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        lab[m] = i
    return lab[..., None]


def _stack(labels, codes, extra):
    """Compiled channels + appended label column (the on-disk layout)."""
    ch = labels_into_channels(labels, codes, extra)
    return np.concatenate([ch, labels.astype(np.float32)], axis=-1)


# transforms exercised for the exact-remap path
ORTHO_2D = [
    ("hflip", flip_transform(1, 2)),
    ("vflip", flip_transform(0, 2)),
    ("rot90_1", rot90_transform(1, 2)),
    ("rot90_2", rot90_transform(2, 2)),
    ("rot90_3", rot90_transform(3, 2)),
]
ORTHO_3D = [
    ("zflip", flip_transform(0, 3)),
    ("hflip", flip_transform(2, 3)),
    ("rot90_1", rot90_transform(1, 3)),
]

CASES_2D = [
    (("F", "C"), {}),
    (("B", "C", "F"), {}),
    (("Gv", "Gh"), {}),
    (("H", "V"), {}),
    (("R",), {"R": {"nrays": 8}}),
    (("A",), {}),
    (("Db", "F"), {}),
    (("F", "Gv", "Gh", "Db"), {}),
]
CASES_3D = [
    (("Gz", "Gv", "Gh"), {}),
    (("Z", "V", "H"), {}),
    (("A",), {}),
]


def _tol_for(codes):
    # flow diffusion is equivariant only up to numerics
    return 1e-4 if any(c in ("Gv", "Gh", "Gz") for c in codes) else 1e-6


@pytest.mark.parametrize("codes,extra", CASES_2D, ids=lambda v: "+".join(v) if isinstance(v, tuple) else "")
@pytest.mark.parametrize("tname,t", ORTHO_2D, ids=[n for n, _ in ORTHO_2D])
def test_exact_remap_2d(codes, extra, tname, t):
    labels = _labels2d()
    h = build_train_channel_handler(codes, 2, extra)
    assert h.supports(t), f"{codes} must support {tname}"
    stack = _stack(labels, codes, extra)
    aug = t.apply(stack).copy()
    h.remap_forward(aug, t)
    want = labels_into_channels(t.apply(labels), codes, extra)
    np.testing.assert_allclose(aug[..., : want.shape[-1]], want,
                               atol=_tol_for(codes), rtol=0)
    # label column rides along untouched by the remap
    np.testing.assert_array_equal(aug[..., -1:], t.apply(labels).astype(np.float32))


@pytest.mark.parametrize("codes,extra", CASES_3D, ids=lambda v: "+".join(v) if isinstance(v, tuple) else "")
@pytest.mark.parametrize("tname,t", ORTHO_3D, ids=[n for n, _ in ORTHO_3D])
def test_exact_remap_3d(codes, extra, tname, t):
    labels = _labels3d()
    h = build_train_channel_handler(codes, 3, extra)
    assert h.supports(t)
    stack = _stack(labels, codes, extra)
    aug = t.apply(stack).copy()
    h.remap_forward(aug, t)
    want = labels_into_channels(t.apply(labels), codes, extra)
    np.testing.assert_allclose(aug[..., : want.shape[-1]], want,
                               atol=_tol_for(codes), rtol=0)


def test_scalar_warp_would_be_wrong():
    """Sanity: the remap has teeth — flipping flow channels as scalars does
    NOT equal compile-after-flip (the round-2 corruption this fixes)."""
    labels = _labels2d()
    codes, extra = ("Gv", "Gh"), {}
    t = flip_transform(1, 2)  # hflip negates Gh
    stack = _stack(labels, codes, extra)
    scalar_warp = t.apply(stack)[..., :2]
    want = labels_into_channels(t.apply(labels), codes, extra)
    assert not np.allclose(scalar_warp, want, atol=1e-3)


def test_rays_3d_rot90_requires_regen():
    h = build_train_channel_handler(("R",), 3, {"R": {"nrays": 8}})
    assert not h.supports(rot90_transform(1, 3))
    assert h.supports(flip_transform(0, 3)) in (True, False)  # well-defined


def _cfg(**over):
    from biapy_tpu.config.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.defrost()
    a = cfg.AUGMENTOR
    a.ENABLE = True
    # disable everything, then enable what the test asks
    for k in list(a.keys()):
        if isinstance(a[k], bool) and k != "ENABLE":
            a[k] = False
    for k, v in over.items():
        setattr(a, k, v)
    return cfg


def test_pipeline_flip_exact_path():
    """AugmentorPipeline + handler: flips remap flow channels exactly."""
    labels = _labels2d(seed=3)
    codes, extra = ("F", "Gv", "Gh"), {}
    h = build_train_channel_handler(codes, 2, extra)
    cfg = _cfg(HFLIP=True, HFLIP_PROB=1.0)
    pipe = A.AugmentorPipeline(cfg, ndim=2, channel_handler=h)
    img = np.random.default_rng(0).random(labels.shape[:-1] + (1,)).astype(np.float32)
    stack = _stack(labels, codes, extra)
    img2, mask2 = pipe(img, stack.copy(), np.random.default_rng(1))
    want = labels_into_channels(np.flip(labels, axis=1), codes, extra)
    np.testing.assert_allclose(mask2[..., :3], want, atol=1e-4, rtol=0)
    np.testing.assert_array_equal(img2, np.flip(img, axis=1))


def test_pipeline_affine_regen_path():
    """AugmentorPipeline + handler: arbitrary rotation regenerates the
    geometry channels from the warped label column."""
    labels = _labels2d(seed=4)
    codes, extra = ("F", "Gv", "Gh", "Db"), {}
    h = build_train_channel_handler(codes, 2, extra)
    cfg = _cfg(RANDOM_ROT=True, RANDOM_ROT_PROB=1.0, RANDOM_ROT_RANGE=(25.0, 25.0))
    pipe = A.AugmentorPipeline(cfg, ndim=2, channel_handler=h)
    img = np.random.default_rng(0).random(labels.shape[:-1] + (1,)).astype(np.float32)
    stack = _stack(labels, codes, extra)
    img2, mask2 = pipe(img, stack.copy(), np.random.default_rng(1))
    # the label column is the authority: geometry cols == recompile from it
    lab2 = np.rint(mask2[..., -1]).astype(np.int32)[..., None]
    want = labels_into_channels(lab2, codes, extra)
    np.testing.assert_allclose(mask2[..., 1:4], want[..., 1:4], atol=1e-4, rtol=0)
    # and the result differs from naive scalar warping of the flow channels
    naive, _ = A.affine_2d(img.copy(), stack.copy(), np.random.default_rng(1),
                           rot_deg=25.0, mode="constant")


def test_cellpose_flows_force_constant_affine():
    h = build_train_channel_handler(("F", "Gv", "Gh"), 2, {})
    assert h.affine_mode == "constant"
    h2 = build_train_channel_handler(
        ("F", "Gv", "Gh"), 2, {"Gv": {"gradient_type": "omnipose"}})
    assert h2.affine_mode is None
    h3 = build_train_channel_handler(("F", "C"), 2, {})
    assert h3.affine_mode is None


def test_geometry_codes_cover_regen():
    h = build_train_channel_handler(("B", "C", "Gv", "Gh", "Db"), 2, {})
    # cols: B=0, C=1, Gv=2, Gh=3, Db=4; label col = 5
    assert h.regen_cols == (2, 3, 4)
    assert h.label_col == 5
    assert h.can_regen
