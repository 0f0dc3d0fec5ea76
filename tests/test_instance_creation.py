"""Oracle tests for flow-tracking and StarDist-NMS instance creation:
GT labels -> channel representation -> instance creation must recover the
instances (reference pattern: run the representation's own compiler as the
perfect model)."""

import numpy as np
import pytest

from biapy_tpu.config.config import get_cfg_defaults
from biapy_tpu.data.pre_processing import channels_per_code, labels_into_channels
from biapy_tpu.engine.instance_seg import Instance_Segmentation_Workflow
from biapy_tpu.utils.matching import matching


def _circles_2d(shape=(96, 96), n=5, seed=1):
    rng = np.random.default_rng(seed)
    lab = np.zeros(shape, np.int32)
    centers = []
    tries = 0
    while len(centers) < n and tries < 300:
        tries += 1
        cy, cx = rng.integers(14, shape[0] - 14, 2)
        r = int(rng.integers(7, 12))
        if any((cy - y) ** 2 + (cx - x) ** 2 < (r + rr + 4) ** 2 for y, x, rr in centers):
            continue
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        lab[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = len(centers) + 1
        centers.append((cy, cx, r))
    return lab


def _workflow(codes, extra=None, ndim=2):
    cfg = get_cfg_defaults()
    cfg.merge_from_dict({
        "PROBLEM": {"TYPE": "INSTANCE_SEG",
                    "NDIM": "3D" if ndim == 3 else "2D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": list(codes),
                                     "DATA_CHANNELS_EXTRA_OPTS": [extra or {}]}},
        "DATA": {"PATCH_SIZE": (32, 32, 1) if ndim == 2 else (16, 32, 32, 1)},
    })
    wf = Instance_Segmentation_Workflow.__new__(Instance_Segmentation_Workflow)
    wf.cfg = cfg
    wf.nd = ndim
    wf.define_activations_and_channels()
    return wf


def test_flow_tracking_oracle_2d():
    lab = _circles_2d()
    chans = labels_into_channels(lab, ["F", "Gv", "Gh"])
    wf = _workflow(["F", "Gv", "Gh"])
    inst = wf.instance_seg_process(chans)
    stats = matching(lab, inst, thresh=[0.5])[0]
    assert stats["f1"] > 0.8, stats


def test_stardist_nms_oracle_2d():
    lab = _circles_2d(seed=2)
    extra = {"R": {"nrays": 32}}
    chans = labels_into_channels(lab, ["P", "R"], extra)
    # probability channel: use the F map instead of sparse points for a
    # denser candidate field
    f = labels_into_channels(lab, ["F"])
    chans[..., 0] = f[..., 0]
    wf = _workflow(["P", "R"], extra)
    inst = wf.instance_seg_process(chans)
    stats = matching(lab, inst, thresh=[0.5])[0]
    assert stats["f1"] > 0.8, stats


def test_watershed_oracle_2d():
    lab = _circles_2d(seed=3)
    chans = labels_into_channels(lab, ["F", "C"])
    wf = _workflow(["F", "C"])
    inst = wf.instance_seg_process(chans)
    stats = matching(lab, inst, thresh=[0.5])[0]
    assert stats["f1"] > 0.9, stats


def test_embedseg_oracle_2d():
    """Perfect EmbedSeg prediction (offsets to centers, tight sigmas) must
    cluster back to the instances and give near-zero loss."""
    import jax
    import jax.numpy as jnp

    from biapy_tpu.ops.embedseg import embedseg_cluster, spatial_emb_loss

    lab = _circles_2d(seed=4, n=3)
    h, w = lab.shape
    gs = max(h, w)
    step = 1.0 / (gs - 1)
    coords = np.stack(np.meshgrid(np.arange(h) * step, np.arange(w) * step,
                                  indexing="ij"), axis=-1).astype(np.float32)
    offs = np.zeros((h, w, 2), np.float32)
    for k in np.unique(lab):
        if k == 0:
            continue
        m = lab == k
        offs[m] = coords[m].mean(axis=0) - coords[m]
    # precision form: s = exp(10 * raw); raw 0.6 -> s ~ 400, phi drops below
    # 0.5 within ~2.6 px of a center at this grid step
    sig = np.full((h, w, 2), 0.6, np.float32)
    seed = np.where(lab > 0, 5.0, -5.0).astype(np.float32)
    pred = np.concatenate([np.arctanh(np.clip(offs, -0.99, 0.99)), sig, seed[..., None]], axis=-1)
    inst = embedseg_cluster(pred, 2, grid_size=gs)
    assert matching(lab, inst, thresh=[0.5])[0]["f1"] == 1.0
    loss = float(spatial_emb_loss(jnp.asarray(pred), jnp.asarray(lab), 2, grid_size=gs))
    assert loss < 0.3
    g = jax.grad(lambda p: spatial_emb_loss(p, jnp.asarray(lab), 2, grid_size=gs))(jnp.asarray(pred))
    assert bool(jnp.isfinite(g).all())


def test_embedseg_cluster_rejects_fragments():
    """EmbedSeg's anti-fragmentation rule (reference: embedseg.py proposal
    acceptance): a proposal whose pixels are mostly already clustered is
    discarded — and its pixels marked clustered so they cannot re-seed —
    instead of becoming a spurious rim instance. Construction: a 10x10 block
    embeds tightly at point a (accepted first); a 40-px strip embeds at a
    nearby point b with a looser sigma whose proposal covers block+strip
    (29% unclustered) — it must be rejected, leaving exactly one instance."""
    from biapy_tpu.ops.embedseg import embedseg_cluster

    gs = 20
    step = 1.0 / (gs - 1)
    coords = np.stack(np.meshgrid(np.arange(gs) * step, np.arange(gs) * step,
                                  indexing="ij"), axis=-1).astype(np.float32)
    block = np.zeros((gs, gs), bool)
    block[4:14, 4:14] = True
    strip = np.zeros((gs, gs), bool)
    strip[4:12, 15:] = True  # 8x5 = 40 px
    a = coords[9, 9].copy()
    b = a + np.array([0.0, 2.0 * step], np.float32)  # 2 px away in x

    offs = np.zeros((gs, gs, 2), np.float32)
    offs[block] = a - coords[block]
    offs[strip] = b - coords[strip]
    # per-pixel raw sigma: tight on the block (phi(b from a) ~ 0.01 < 0.5),
    # loose on the strip (phi(a from b) ~ 0.7 > 0.5 -> proposal swallows the
    # already-clustered block)
    sig = np.zeros((gs, gs, 2), np.float32)
    sig[block] = 0.6
    sig[strip] = 0.35
    seed_logit = np.full((gs, gs), -5.0, np.float32)
    seed_logit[block] = 3.0   # seeds first (sigmoid ~ 0.953)
    seed_logit[strip] = 2.5   # still above seed_thresh 0.9 (sigmoid ~ 0.924)
    pred = np.concatenate([np.arctanh(np.clip(offs, -0.99, 0.99)), sig,
                           seed_logit[..., None]], axis=-1)
    inst = embedseg_cluster(pred, 2, grid_size=gs)
    assert inst.max() == 1, f"rim fragment became an instance: {np.unique(inst)}"
    assert (inst[block] == 1).all()
    assert (inst[strip] == 0).all()


def test_embedseg_workflow_dispatch():
    wf = _workflow(["E_offset", "E_sigma", "E_seediness"])
    assert wf.embedseg_mode
    assert wf.output_channels == [5]  # 2+2+1 in 2D


# ---------------------------------------------------------- StarDist 3D
def test_radial_distances_2d_matches_bruteforce():
    """Vectorized ray marching == the straightforward per-pixel loop."""
    from biapy_tpu.data.pre_processing import generate_rays, radial_distances

    rng = np.random.default_rng(0)
    lab = np.zeros((24, 24), np.int32)
    lab[4:12, 4:14] = 1
    lab[14:22, 10:20] = 2
    nrays = 8
    out = radial_distances(lab, nrays)
    rays = generate_rays(nrays, 2)
    for _ in range(20):
        y, x = rng.integers(0, 24, 2)
        if lab[y, x] == 0:
            assert np.all(out[y, x] == 0)
            continue
        for k in range(nrays):
            t = 1.0
            while True:
                iy, ix = int(round(y + rays[k, 0] * t)), int(round(x + rays[k, 1] * t))
                if iy < 0 or iy >= 24 or ix < 0 or ix >= 24 or lab[iy, ix] != lab[y, x]:
                    break
                t += 1.0
            assert out[y, x, k] == t, (y, x, k)


def test_stardist_3d_oracle():
    """Perfect 3D ray/prob maps (from labels_into_channels' own kernels) must
    reconstruct the instances through the polyhedra NMS."""
    from biapy_tpu.data.pre_processing import radial_distances
    from biapy_tpu.data.polygon_nms import stardist_nms_3d
    from biapy_tpu.utils.matching import matching
    from scipy import ndimage

    lab = np.zeros((24, 48, 48), np.int32)
    zz, yy, xx = np.mgrid[:24, :48, :48]
    for i, (cz, cy, cx, r) in enumerate([(8, 12, 12, 8), (14, 32, 30, 9), (10, 14, 36, 7)]):
        lab[((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = i + 1

    nrays = 64
    rays = radial_distances(lab, nrays)
    # probability peaks at the instance centers (EDT-normalized per instance)
    dist = ndimage.distance_transform_edt(lab > 0).astype(np.float32)
    prob = np.zeros_like(dist)
    for lb in (1, 2, 3):
        m = lab == lb
        prob[m] = dist[m] / dist[m].max()

    pred = stardist_nms_3d(prob, rays, prob_threshold=0.8, iou_threshold=0.3, grid_step=2)
    stats = matching(lab, pred, thresh=[0.5])
    assert stats[0]["f1"] == 1.0, stats


# ------------------------------------------------- Cellpose test rescale
def test_cellpose_test_rescale_hooks(tmp_path):
    import os

    """DIAMETER>0 rescales the input in-plane by DIAM_MEAN/diameter and the
    merged prediction is resized back to native (reference:
    workflow_utils/cellpose.py)."""
    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    os.makedirs(tmp_path / "x")
    write_tiff(str(tmp_path / "x" / "a.tif"), np.zeros((64, 64), np.uint8))
    cfg = {
        "PROBLEM": {"TYPE": "INSTANCE_SEG", "NDIM": "2D",
                    "INSTANCE_SEG": {"DATA_CHANNELS": ["F", "Gv", "Gh"],
                                     "CELLPOSE": {"DIAMETER": 60.0, "DIAM_MEAN": 30.0}}},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": str(tmp_path / "x"),
                           "GT_PATH": str(tmp_path / "x")},
                 "TEST": {"PATH": str(tmp_path / "x"), "LOAD_GT": False}},
        # TRAIN on (but never run) — a test-only config without a checkpoint
        # is rejected by validation, and this test only builds the workflow
        "TRAIN": {"ENABLE": True},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=str(tmp_path), name="cp", silent=True)
    job._build_workflow()
    wf = job.workflow
    img = np.zeros((64, 64, 1), np.float32)
    out, _ = wf.before_test_sample(img, None, "a.tif")
    assert out.shape == (32, 32, 1), out.shape     # factor 30/60 = 0.5
    pred = np.zeros((32, 32, 3), np.float32)
    back = wf.post_merge_transform(pred, "a.tif")
    assert back.shape == (64, 64, 3), back.shape

    # omnipose is diameter-agnostic: no rescale
    cfg["PROBLEM"]["INSTANCE_SEG"]["INSTANCE_CREATION_PROCESS"] = "omnipose"
    job2 = BiaPy(cfg, result_dir=str(tmp_path), name="cp2", silent=True)
    job2._build_workflow()
    out2, _ = job2.workflow.before_test_sample(img, None, "a.tif")
    assert out2.shape == (64, 64, 1)


def test_pallas_conv3d_fallback_and_geometry():
    """CPU: the Pallas fast path must decline (Mosaic needs TPU) and the XLA
    fallback must be exact; geometry helpers stay consistent."""
    import jax, jax.numpy as jnp
    from biapy_tpu.ops.pallas.conv3d import conv3d, _conv3d_xla, _geom, pack_weights, supported

    assert not supported((1, 8, 32, 32, 32), (3, 3, 3, 32, 32))  # cpu backend
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 6, 16, 16, 8), jnp.float32)
    w = jax.random.normal(k, (3, 3, 3, 8, 4), jnp.float32) * 0.1
    assert jnp.allclose(conv3d(x, w), _conv3d_xla(x, w), atol=1e-5)
    # gradients flow through the custom vjp
    g = jax.grad(lambda w: conv3d(x, w).sum())(w)
    g_ref = jax.grad(lambda w: _conv3d_xla(x, w).sum())(w)
    assert jnp.allclose(g, g_ref, atol=1e-4)
    q, wq, nq = _geom(128, 32, 32)
    assert q == 4 and wq == 32 and nq * q >= 130
    wp = pack_weights(jnp.asarray(w, jnp.float32).repeat(4, 3).repeat(8, 4), q=4)
    assert wp.shape == (9, 2 * 4 * 32, 4 * 32)


# -------------------------------------------------------------- Omnipose
def test_omnipose_distance_and_flows_oracle():
    """Eikonal distance peaks at cell centers, flows point inward, and the
    full compute_masks reconstruction recovers the instances."""
    from biapy_tpu.ops.omnipose import compute_masks_omnipose, omnipose_flows, smooth_distance

    lab = np.zeros((96, 96), np.int32)
    yy, xx = np.mgrid[:96, :96]
    centers = [(24, 24, 14), (60, 60, 16), (30, 70, 11)]
    for i, (cy, cx, r) in enumerate(centers):
        lab[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = i + 1

    T = smooth_distance(lab)
    assert T[lab == 0].max() == 0
    for cy, cx, r in centers:
        assert T[cy, cx] > T[cy + r - 2, cx], "distance must peak at the center"

    T2, mu = omnipose_flows(lab)
    # flows at the cell edge point towards the center
    cy, cx, r = centers[0]
    v = mu[cy, cx + r - 2]
    assert v[1] < 0, f"edge flow should point inward (x comp {v}ize)"

    dist = T.copy()
    dist[lab == 0] = -5.0
    pred = compute_masks_omnipose(mu, dist, mask_threshold=0.0, flow_threshold=0.0)
    from biapy_tpu.utils.matching import matching

    stats = matching(lab, pred, thresh=[0.5])[0]
    assert stats["f1"] == 1.0, stats


def test_omnipose_channels_in_compiler():
    from biapy_tpu.data.pre_processing import labels_into_channels

    lab = np.zeros((48, 48), np.int32)
    lab[10:25, 10:25] = 1
    lab[30:44, 28:44] = 2
    extra = {"Db": {"val_type": "omnipose", "dist_bg": 5.0},
             "Gv": {"gradient_type": "omnipose"}}
    out = labels_into_channels(lab[..., None], ["Db", "Gv", "Gh"], extra)
    assert out.shape == (48, 48, 3)
    assert np.allclose(out[..., 0][lab == 0], -5.0)
    assert out[..., 0][lab > 0].min() > 0


def test_detection_watershed_donuts():
    """Donut (ring) cells get an extra seed dilation sized from the center
    intensity profile so the watershed claims the ring (reference:
    detection_watershed, post_processing.py:2100-2360)."""
    from biapy_tpu.data.post_processing import detection_watershed

    img = np.zeros((128, 128), np.float32)
    yy, xx = np.mgrid[:128, :128]
    # ring cell centered (64,64): bright membrane radius 30..40, dark lumen
    r = np.sqrt((yy - 64.0) ** 2 + (xx - 64.0) ** 2)
    img += ((r > 30) & (r < 40)) * 1.0
    # solid cell at (20,20)
    img += (np.sqrt((yy - 20.0) ** 2 + (xx - 20.0) ** 2) < 8) * 1.0
    pts = np.array([[64, 64], [20, 20]])

    plain = detection_watershed(pts, img, first_dilation=(2, 2))
    donut = detection_watershed(pts, img, first_dilation=(2, 2),
                                donuts_classes=[1],
                                donuts_patch=[100, 100],
                                donuts_nucleus_diameter=20)
    ring = (r > 30) & (r < 40)
    # with donut handling, the ring pixels belong to instance 1
    frac_donut = (donut[ring] == 1).mean()
    frac_plain = (plain[ring] == 1).mean()
    assert frac_donut > 0.9, f"donut watershed should claim the ring ({frac_donut:.2f})"
    assert donut[20, 20] == 2  # solid cell unaffected
    assert frac_donut >= frac_plain


def test_remove_close_points_by_mask():
    """Close points suppress each other only within the SAME mask component
    (reference: remove_close_points_by_mask, post_processing.py:1839)."""
    from biapy_tpu.data.post_processing import remove_close_points, remove_close_points_by_mask

    labs = np.zeros((40, 40), np.int32)
    labs[5:15, 5:15] = 1
    labs[5:15, 20:30] = 2
    pts = np.array([[8, 8], [10, 10],    # both in label 1, 2.8px apart
                    [8, 24], [10, 26],   # both in label 2
                    [35, 35]])           # background
    plain = remove_close_points(pts, 5.0)
    by_mask = remove_close_points_by_mask(pts, 5.0, labs)
    assert len(plain) == 3  # one survivor per close pair + the bg point
    assert len(by_mask) == 3
    # cross-label closeness is NOT suppressed
    pts2 = np.array([[8, 14], [8, 21]])  # 7px apart but different labels
    assert len(remove_close_points(pts2, 10.0)) == 1
    assert len(remove_close_points_by_mask(pts2, 10.0, labs)) == 2


def test_we_border_weight_channel():
    """'We' compiles a U-Net border weight map as a GT-only channel and the
    loss consumes it (reference: BORDER_EXTRA_WEIGHTS 'unet-like',
    metrics.py:1637)."""
    import jax.numpy as jnp

    from biapy_tpu.data.pre_processing import labels_into_channels
    from biapy_tpu.engine.metrics import instance_segmentation_loss

    lab = np.zeros((40, 40, 1), np.int32)
    lab[5:18, 5:18] = 1
    lab[5:18, 21:34] = 2  # 3-px gap: the weight map must peak in between
    ch = labels_into_channels(lab, mode=("F", "C", "We"))
    assert ch.shape == (40, 40, 3)
    wmap = ch[..., 2]
    gap = wmap[10, 18:21].mean()
    far = wmap[35, 35]
    assert gap > far, (gap, far)

    loss = instance_segmentation_loss(
        out_channels=["F", "C", "We"], losses_to_use=["bce", "bce", "bce"],
        channel_weights=[1.0, 1.0, 1.0], channels_per_output=[1, 1, 1])
    pred = jnp.zeros((1, 40, 40, 2))  # model predicts only F+C
    y = jnp.asarray(ch[None])
    l = float(loss(pred, y))
    assert np.isfinite(l) and l > 0
    # the border weights make a wrong-positive in the gap cost more than
    # the same mistake far from any instance
    bad_gap = jnp.zeros((1, 40, 40, 2)).at[0, 10, 19, 0].set(10.0)
    bad_far = jnp.zeros((1, 40, 40, 2)).at[0, 35, 35, 0].set(10.0)
    assert float(loss(bad_gap, y)) > float(loss(bad_far, y))


def test_measure_instance_properties_extra_props(tmp_path):
    """EXTRA_PROPS columns: perimeter/circularity (2D), bbox, elongation,
    physical area (reference: MEASURE_PROPERTIES.EXTRA_PROPS,
    post_processing.py:2424)."""
    from biapy_tpu.data.post_processing import (instance_properties_csv,
                                                measure_instance_properties)

    lab = np.zeros((40, 40), np.int32)
    lab[5:15, 5:15] = 1        # 10x10 square
    lab[20:24, 5:33] = 2       # 4x28 elongated bar
    p = measure_instance_properties(lab, resolution=(2.0, 2.0),
                                    extra_props=["perimeter", "circularity",
                                                 "bbox", "elongation", "area"])
    assert list(p["id"]) == [1, 2]
    assert p["perimeter"][0] > 0
    # the square is rounder than the bar
    assert p["circularity"][0] > p["circularity"][1]
    assert p["elongation"][1] > p["elongation"][0]
    assert p["area"][0] == 100 * 4.0  # 100 px * (2*2) physical units
    assert list(p["bbox"][0]) == [5, 5, 15, 15]

    out = str(tmp_path / "props.csv")
    instance_properties_csv(lab, out, extra_props=["perimeter", "circularity", "bbox"])
    import csv
    rows = list(csv.reader(open(out)))
    assert len(rows) == 3 and "circularity" in rows[0] and "bbox-0" in rows[0]


def test_apply_label_refinement_chain():
    """INSTANCE_REFINEMENT ops (reference: apply_label_refinement,
    post_processing.py:2900): fill_holes closes instance cavities,
    clear_border drops border-touching labels, dilation grows, and
    remove_small/big_objects filter by pixel count."""
    from biapy_tpu.data.post_processing import apply_label_refinement

    lab = np.zeros((32, 32), np.int32)
    lab[4:14, 4:14] = 1
    lab[8:10, 8:10] = 0            # cavity inside instance 1
    lab[0:6, 20:26] = 2            # touches the top border
    lab[20:22, 20:22] = 3          # tiny 4-px object

    out = apply_label_refinement(lab, ["fill_holes"], ["none"])
    assert (out[8:10, 8:10] == 1).all() and out.max() == 3

    out = apply_label_refinement(lab, ["clear_border"], ["none"])
    assert 2 not in out and 1 in out and 3 in out

    out = apply_label_refinement(lab, ["remove_small_objects"], [10])
    assert 3 not in out and 1 in out

    out = apply_label_refinement(lab, ["remove_big_objects"], [50])
    assert 1 not in out and 3 in out

    out = apply_label_refinement(lab, ["dilation"], [3])
    assert (out == 3).sum() > (lab == 3).sum()

    # chained: fill then drop the border instance, positional values
    out = apply_label_refinement(lab, ["fill_holes", "clear_border"], ["none", "none"])
    assert (out[8:10, 8:10] == 1).all() and 2 not in out


def test_embedseg_anisotropy_and_weights():
    """Anisotropic (z, y, x) resolution scales the coordinate grid's z step
    (reference: SpatialEmbLoss anisotropy, metrics.py:2415) and the
    foreground weight scales the fg seed regression (channel_weights[0],
    metrics.py:2568)."""
    import jax.numpy as jnp

    from biapy_tpu.ops.embedseg import _axis_ratios, _coord_grid, spatial_emb_loss

    assert _axis_ratios(3, [4.0, 1.0, 1.0]) == (4.0, 1.0, 1.0)
    assert _axis_ratios(2, [1.0, 1.0]) == (1.0, 1.0)
    g = _coord_grid((4, 4, 4), grid_size=64, ratios=(4.0, 1.0, 1.0))
    # z step is 4x the y step
    assert float(g[1, 0, 0, 0]) == 4 * float(g[0, 1, 0, 1])

    lab = np.zeros((16, 16), np.int32)
    lab[4:12, 4:12] = 1
    pred = np.random.default_rng(0).normal(0, 0.3, (16, 16, 5)).astype(np.float32)
    base = float(spatial_emb_loss(jnp.asarray(pred), jnp.asarray(lab), 2,
                                  grid_size=16, w_fg=1.0))
    fgw = float(spatial_emb_loss(jnp.asarray(pred), jnp.asarray(lab), 2,
                                 grid_size=16, w_fg=10.0))
    assert fgw > base  # fg seed term got heavier
    med = float(spatial_emb_loss(jnp.asarray(pred), jnp.asarray(lab), 2,
                                 grid_size=16, center_mode="medoid"))
    assert np.isfinite(med)


def test_embedseg_oracle_3d():
    """3D EmbedSeg: a perfect prediction (offsets to sphere centers, tight
    precision) clusters back to the instances; the 3D loss is finite with
    finite gradients."""
    import jax
    import jax.numpy as jnp

    from biapy_tpu.ops.embedseg import embedseg_cluster, spatial_emb_loss

    lab = np.zeros((16, 32, 32), np.int32)
    zz, yy, xx = np.mgrid[:16, :32, :32]
    for i, (cz, cy, cx, r) in enumerate([(5, 8, 8, 4), (10, 22, 20, 5)]):
        lab[((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = i + 1
    gs = 32
    step = 1.0 / (gs - 1)
    coords = np.stack(np.meshgrid(np.arange(16) * step, np.arange(32) * step,
                                  np.arange(32) * step, indexing="ij"), axis=-1).astype(np.float32)
    offs = np.zeros(lab.shape + (3,), np.float32)
    for k in (1, 2):
        m = lab == k
        offs[m] = coords[m].mean(axis=0) - coords[m]
    sig = np.full(lab.shape + (3,), 0.6, np.float32)
    seed = np.where(lab > 0, 5.0, -5.0).astype(np.float32)
    pred = np.concatenate([np.arctanh(np.clip(offs, -0.99, 0.99)), sig, seed[..., None]], axis=-1)
    inst = embedseg_cluster(pred, 3, grid_size=gs)
    assert matching(lab, inst, thresh=[0.5])[0]["f1"] == 1.0
    loss = float(spatial_emb_loss(jnp.asarray(pred), jnp.asarray(lab), 3, grid_size=gs))
    assert loss < 0.3
    g = jax.grad(lambda p: spatial_emb_loss(p, jnp.asarray(lab), 3, grid_size=gs,
                                            anisotropy=[4.0, 1.0, 1.0]))(jnp.asarray(pred))
    assert bool(jnp.isfinite(g).all())


def test_filter_instances_by_geometric_properties():
    """REMOVE_BY_PROPERTIES on derived measures (circularity) actually
    measures them — a filter on an unmeasured property used to pass
    silently (and 'circularity' was aliased to 'size')."""
    from biapy_tpu.data.post_processing import filter_instances_by_properties

    lab = np.zeros((64, 64), np.int32)
    yy, xx = np.mgrid[:64, :64]
    lab[((yy - 16) ** 2 + (xx - 16) ** 2) < 100] = 1  # circle: circularity ~1
    lab[40:44, 4:60] = 2  # long thin bar: circularity << 0.5
    out = filter_instances_by_properties(lab, ["circularity"], [0.5], ["lt"])
    assert set(np.unique(out)) == {0, 1}, "bar removed, circle kept"
    # size synonym still filters by pixel count
    out = filter_instances_by_properties(lab, ["area"], [250], ["lt"])
    assert set(np.unique(out)) == {0, 1}


def test_dc_channel_and_empty_affinity_axes():
    """'Dc' (distance-to-center) compiles (it crashed on a broadcast bug),
    and an explicitly-empty affinity axis emits no channel so the layout
    matches channels_per_code."""
    from biapy_tpu.data.pre_processing import (channels_per_code,
                                               labels_into_channels)

    lab = np.zeros((16, 20), np.int32)
    lab[2:8, 2:8] = 1
    lab[9:15, 10:18] = 2
    dc = labels_into_channels(lab, ("Dc",))
    assert dc.shape == (16, 20, 1)
    assert dc[lab == 0].max() == 0.0
    assert 0.0 <= dc.min() and dc.max() <= 1.0
    assert dc[lab > 0].max() > 0.0

    extra = {"A": {"y_affinities": [], "x_affinities": [1, 3]}}
    a = labels_into_channels(lab, ("A",), extra)
    assert a.shape[-1] == channels_per_code("A", extra, 2) == 2


def test_touching_instance_flows_point_inward():
    """Cellpose flows at the boundary between two touching instances point
    toward EACH instance's own center — a global gradient of the shared
    heat map leaked the neighbour's field across the boundary."""
    from biapy_tpu.data.pre_processing import cellpose_flows

    lab = np.zeros((20, 20), np.int32)
    lab[:, :10] = 1
    lab[:, 10:] = 2
    g = cellpose_flows(lab)  # (y, x, 2) with (dy, dx)
    # column 9 belongs to instance 1 (center x~4.5): flow x-component < 0
    # column 10 belongs to instance 2 (center x~14.5): flow x-component > 0
    assert np.median(g[5:15, 9, 1]) < 0
    assert np.median(g[5:15, 10, 1]) > 0


def test_matching_non_sequential_gt_labels():
    """Curated (gapped) GT label ids must not create phantom instances, and
    matched_pairs must report the ORIGINAL label values."""
    from biapy_tpu.utils.matching import matching

    gt = np.zeros((20, 20), np.int32)
    gt[2:8, 2:8] = 5
    gt[12:18, 12:18] = 9
    pred = np.zeros_like(gt)
    pred[2:8, 2:8] = 1
    pred[12:18, 12:18] = 2
    r = matching(gt, pred, thresh=[0.5], report_matches=True)[0]
    assert r["n_true"] == 2 and r["fn"] == 0 and r["tp"] == 2, r
    assert sorted(r["matched_pairs"]) == [(5, 1), (9, 2)], r["matched_pairs"]


def test_watershed_topo_channel_and_background_growth():
    """TOPOGRAPHIC_SURFACE_CHANNEL is honored and a B-only representation
    grows inside 1-B instead of flooding the whole image."""
    from biapy_tpu.data.post_processing import watershed_by_channels

    # two blobs encoded as background probability (B)
    b = np.ones((32, 32), np.float32)
    b[4:14, 4:14] = 0.0
    b[18:28, 18:28] = 0.0
    p = np.zeros_like(b)
    p[8:10, 8:10] = 1.0
    p[22:24, 22:24] = 1.0
    data = np.stack([b, p], axis=-1)
    lab = watershed_by_channels(data, ["B", "P"], seed_channels=["P"],
                                seed_channel_ths=["auto"])
    assert lab[0, 0] == 0, "background must stay unlabeled (growth = 1-B)"
    ids = set(np.unique(lab)) - {0}
    assert len(ids) == 2, np.unique(lab)

    # explicit topo channel: accepted without touching the result validity
    lab2 = watershed_by_channels(data, ["B", "P"], seed_channels=["P"],
                                 seed_channel_ths=["auto"],
                                 topo_surface_channel="P")
    assert set(np.unique(lab2)) - {0} == ids
