"""TTA oracle-equivariance tests.

Reference analog: tests/test_tta_equivariance.py (the reference's one真
unit suite). The trick (reference docstring :27-46): the "perfect model" for
an instance representation IS labels_into_channels, so running real target
generation through ensemble_predictions as the pred_fn must return the
UN-augmented representation — pinning every channel remap (flows, hover,
rays, affinities) against the code that defines the representation.
"""

import numpy as np
import pytest

from biapy_tpu.data.pre_processing import channels_per_code, labels_into_channels
from biapy_tpu.data.tta import (
    AxisTransform,
    build_axis_transform_group,
    build_tta_spec,
    ensemble_predictions,
)


def _labels_2d(seed=0, shape=(48, 48), n=3):
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.int32)
    centers = []
    while len(centers) < n:
        cy, cx = rng.integers(10, shape[0] - 10, 2)
        r = int(rng.integers(4, 8))
        if any((cy - y) ** 2 + (cx - x) ** 2 < (r + rr + 2) ** 2 for y, x, rr in centers):
            continue
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        lab[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = len(centers) + 1
        centers.append((cy, cx, r))
    return lab


def _labels_3d(seed=0, shape=(16, 32, 32), n=2):
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.int32)
    for i in range(n):
        cz, cy, cx = rng.integers(6, np.array(shape) - 6)
        r = int(rng.integers(3, 5))
        zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
        lab[((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = i + 1
    return lab


def _oracle(codes, extra=None, ndim=2):
    """pred_fn that regenerates the representation from a (transformed)
    label image."""

    def pred_fn(lab_img):
        lab = lab_img[..., 0].astype(np.int32)
        return labels_into_channels(lab, codes, extra)

    return pred_fn


def _run_oracle(codes, labels, extra=None, atol=1e-4, frac_tol=0.0):
    ndim = labels.ndim
    cpc = [channels_per_code(c, extra or {}) for c in codes]
    spec = build_tta_spec(codes, cpc, ndim, extra)
    ref = labels_into_channels(labels, codes, extra)
    out = ensemble_predictions(_oracle(codes, extra, ndim), labels[..., None].astype(np.float32),
                               spec=spec)
    diff = np.abs(out - ref)
    if frac_tol > 0:
        frac_bad = float((diff > atol).mean())
        assert frac_bad <= frac_tol, f"{codes}: {frac_bad:.4f} of voxels differ (> {frac_tol})"
    else:
        assert diff.max() <= atol, f"{codes}: max diff {diff.max()}"


def test_group_sizes():
    assert len(build_axis_transform_group(2)) == 8
    assert len(build_axis_transform_group(3)) == 16
    # all unique
    g = build_axis_transform_group(2)
    assert len(set((t.perm, t.flips) for t in g)) == 8


def test_transform_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((12, 20, 3)).astype(np.float32)
    for t in build_axis_transform_group(2):
        assert np.array_equal(t.inverse().apply(t.apply(x)), x)
    v = rng.random((6, 12, 20, 2)).astype(np.float32)
    for t in build_axis_transform_group(3):
        assert np.array_equal(t.inverse().apply(t.apply(v)), v)


def test_scalar_channels_2d():
    _run_oracle(["F", "C"], _labels_2d())


def test_scalar_channels_3d():
    _run_oracle(["F", "C"], _labels_3d())


def test_hover_channels_2d():
    _run_oracle(["F", "V", "H"], _labels_2d())


def test_hover_channels_3d():
    _run_oracle(["F", "Z", "V", "H"], _labels_3d())


def test_distance_channels_2d():
    _run_oracle(["F", "Db"], _labels_2d())
    _run_oracle(["F", "D"], _labels_2d())


def test_flow_channels_2d():
    # heat-diffusion flows are only approximately equivariant (the diffusion
    # grid is not rotation symmetric); allow a small fraction of mismatches
    # (reference documents the same tolerance, test_tta_equivariance :33-46)
    _run_oracle(["F", "Gv", "Gh"], _labels_2d(), atol=0.05, frac_tol=0.02)


def test_affinity_channels_2d():
    extra = {"A": {"y_affinities": [1], "x_affinities": [1]}}
    _run_oracle(["A"], _labels_2d(), extra=extra)


def test_ray_channels_2d():
    extra = {"R": {"nrays": 8}}
    # rays are approximately equivariant (integer ray marching)
    _run_oracle(["R"], _labels_2d(), extra=extra, atol=1.5, frac_tol=0.02)


def test_unsupported_transforms_degrade():
    # nrays not divisible by 4 -> rot90 orientations must be dropped, leaving
    # a reduced (but valid) ensemble
    extra = {"R": {"nrays": 6}}
    spec = build_tta_spec(["R"], [6], 2, extra)
    group = [t for t in build_axis_transform_group(2) if all(g.supports(t) for g in spec.groups)]
    assert 0 < len(group) < 8


def test_augmentation_group_levels():
    """TEST.AUGMENTATION_GROUP: 'full' = 8 orientations (2D), 'flips' = 4,
    'none' = identity (reference: config.py:1849-1857)."""
    from biapy_tpu.data.tta import build_axis_transform_group

    assert len(build_axis_transform_group(2, level="full")) == 8
    assert len(build_axis_transform_group(2, level="auto")) == 8
    assert len(build_axis_transform_group(2, level="flips")) == 4
    assert len(build_axis_transform_group(2, level="none")) == 1
    assert len(build_axis_transform_group(3, level="full")) == 16
    assert len(build_axis_transform_group(3, level="flips")) == 8
    # flips level really contains only flips (no axis permutations)
    for t in build_axis_transform_group(2, level="flips"):
        assert tuple(t.perm) == (0, 1)


def test_partial_hover_family_3d():
    """H+V without Z in 3D (a combination validation allows) keeps vector
    semantics over the covered axes: transforms mixing y/x with z are
    dropped, the rest permute/sign-flip — treating the pair as scalars
    averaged +g against -g and nulled the offsets."""
    labels = _spheres3d() if "_spheres3d" in dir() else None
    if labels is None:
        rng = np.random.default_rng(3)
        labels = np.zeros((12, 32, 32), np.int32)
        labels[3:9, 4:14, 4:14] = 1
        labels[3:9, 18:28, 18:28] = 2
    _run_oracle(["F", "H", "V"], labels)


def test_embedseg_offsets_equivariant():
    """EmbedSeg offset/sigma/seed channels under the full orientation group:
    a perfect equivariant model ensembles back to its identity prediction
    (offsets are vectors, sigmas permute without sign flips, seed scalar)."""
    from biapy_tpu.data.pre_processing import channels_per_code
    from biapy_tpu.data.tta import build_tta_spec, ensemble_predictions

    shape = (32, 32)
    nd = 2

    def pred_fn(img):
        # marker object in the (transformed) input: offsets point to its
        # center of mass; sigmas are its PER-AXIS SPREAD (flip-invariant,
        # transpose-covariant, like real per-axis variances); seed radial
        a = img[..., 0]
        idx = np.argwhere(a > 0)
        c = idx.mean(axis=0)
        ext = idx.max(axis=0) - idx.min(axis=0) + 1
        coords = np.indices(a.shape).astype(np.float32)
        offs = [(c[d] - coords[d]) / shape[d] for d in range(nd)]
        sig = [np.full(a.shape, ext[d] / shape[d], np.float32) for d in range(nd)]
        r2 = sum((coords[d] - c[d]) ** 2 for d in range(nd))
        seed = np.exp(-r2 / 50.0)
        return np.stack(offs + sig + [seed], axis=-1)

    img = np.zeros(shape + (1,), np.float32)
    img[8:14, 18:30, 0] = 1.0  # anisotropic marker: spreads 6 (y) x 12 (x)
    spec = build_tta_spec(["E"], [channels_per_code("E", {}, nd)], nd, {})
    ref = pred_fn(img)
    out = ensemble_predictions(pred_fn, img, spec=spec)
    np.testing.assert_allclose(out, ref, atol=1e-4)
