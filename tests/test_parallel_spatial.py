"""Spatial partitioning (SYSTEM.SPATIAL_PARTITIONS): a (data, space) mesh
GSPMD-shards the patch's Y axis so one training patch can span several
chips' HBM. TPU-native extension with no reference analog (the torch build
is DDP-only); semantics must match pure data parallelism exactly — XLA
inserts the conv halo exchanges and reduces losses/BN stats globally.
"""

import numpy as np
import pytest


def _small_model_and_batch(seed=0):
    import jax
    import jax.numpy as jnp

    from biapy_tpu.models.unet_family import UNetFamily

    model = UNetFamily(
        variant="resunet", ndim=2, feature_maps=(8, 16), drop_values=(0.0, 0.0),
        conv_layers=(2, 2), yx_down=(2, 2), z_down=(1, 1), isotropy=(True, True),
        normalization="bn", output_channels=(1,), activation="elu",
    )
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    rng = np.random.default_rng(3)
    batch = {"x": rng.normal(size=(8, 32, 32, 1)).astype(np.float32),
             "y": (rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32)}
    return model, variables, batch


def _one_step(model, variables, batch, mesh, spatial_dim=None):
    import jax
    import optax

    from biapy_tpu.engine.metrics import cross_entropy_loss, jaccard_index
    from biapy_tpu.engine.train_engine import TrainState, make_train_step
    from biapy_tpu.parallel import shard_batch

    # SGD so updates are proportional to grads: conv biases feeding BN have
    # mathematically-zero gradients, and a normalizing optimizer (adam)
    # would amplify their cross-layout numerical noise to full-size updates
    tx = optax.sgd(0.1)
    # fresh host copies: the train step donates the state, which would
    # delete the shared `variables` buffers between the two runs
    params = jax.tree.map(np.array, variables["params"])
    stats = jax.tree.map(np.array, variables.get("batch_stats", {}))
    state = TrainState.create(model.apply, params, tx, stats)
    step = make_train_step(lambda out, y: cross_entropy_loss(out, y),
                           {"iou": lambda out, y: jaccard_index(out, y)},
                           mesh=mesh)
    sb = shard_batch(batch, mesh, spatial_dim)
    state, metrics = step(state, sb, jax.random.PRNGKey(7))
    return state, {k: float(v) for k, v in metrics.items()}


def test_spatial_train_step_matches_data_parallel():
    """One optimizer step on a (4, 2) data x space mesh produces the same
    parameters, BN stats and metrics as the plain 8-way data mesh."""
    import jax

    from biapy_tpu.parallel import get_mesh

    model, variables, batch = _small_model_and_batch()
    st_dp, m_dp = _one_step(model, variables, batch, get_mesh())
    st_sp, m_sp = _one_step(model, variables, batch, get_mesh(spatial=2),
                            spatial_dim=1)

    assert np.isfinite(m_dp["loss"]) and abs(m_dp["loss"] - m_sp["loss"]) < 1e-4
    assert abs(m_dp["iou"] - m_sp["iou"]) < 1e-4
    for a, b in zip(jax.tree.leaves(st_dp.params), jax.tree.leaves(st_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(st_dp.batch_stats),
                    jax.tree.leaves(st_sp.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatial_predict_matches_data_parallel():
    import jax

    from biapy_tpu.engine.train_engine import make_predict_fn
    from biapy_tpu.parallel import get_mesh, shard_batch

    model, variables, batch = _small_model_and_batch()
    x = batch["x"]

    def run(mesh, spatial_dim=None):
        predict = make_predict_fn(
            lambda v, x, train=False: model.apply(v, x, train=False), mesh=mesh)
        sx = shard_batch(x, mesh, spatial_dim)
        return np.asarray(jax.device_get(predict(variables, sx)))

    out_dp = run(get_mesh())
    out_sp = run(get_mesh(spatial=2), spatial_dim=1)
    np.testing.assert_allclose(out_dp, out_sp, atol=2e-5)


def test_spatial_partitions_validation():
    from biapy_tpu._biapy import BiaPy

    # classification has no spatial axis in the target
    cfg = {"PROBLEM": {"TYPE": "CLASSIFICATION", "NDIM": "2D"},
           "SYSTEM": {"SPATIAL_PARTITIONS": 2},
           "DATA": {"PATCH_SIZE": (32, 32, 1), "N_CLASSES": 2,
                    "TRAIN": {"PATH": "/tmp/nope"}},
           "TRAIN": {"ENABLE": True, "EPOCHS": 1}}
    with pytest.raises(ValueError, match="SPATIAL_PARTITIONS"):
        BiaPy(cfg, result_dir="/tmp/spval", name="v1", silent=True)

    # Y must be divisible by the partition count
    cfg = {"PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
           "SYSTEM": {"SPATIAL_PARTITIONS": 3},
           "DATA": {"PATCH_SIZE": (32, 32, 1), "TRAIN": {"PATH": "/tmp/nope"}},
           "TRAIN": {"ENABLE": True, "EPOCHS": 1}}
    with pytest.raises(ValueError, match="divide the patch's Y size"):
        BiaPy(cfg, result_dir="/tmp/spval", name="v2", silent=True)


@pytest.mark.slow
def test_spatial_e2e_semantic_seg(tmp_path):
    """A full tiny job with SYSTEM.SPATIAL_PARTITIONS=2 on the 8-device CPU
    mesh (4 data x 2 space): trains, evaluates and stitches test images."""
    import os

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    for d, n in (("train", 8), ("test", 2)):
        os.makedirs(f"{root}/{d}/x"); os.makedirs(f"{root}/{d}/y")
        for i in range(n):
            img = rng.random((64, 64), np.float32)
            msk = (img > 0.5).astype(np.uint8) * 255
            write_tiff(f"{root}/{d}/x/{i:02d}.tif", (img * 255).astype(np.uint8))
            write_tiff(f"{root}/{d}/y/{i:02d}.tif", msk)

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "SYSTEM": {"SPATIAL_PARTITIONS": 2},
        "DATA": {"PATCH_SIZE": (32, 32, 1),
                 "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y"},
                 "VAL": {"SPLIT_TRAIN": 0.25},
                 "TEST": {"PATH": f"{root}/test/x", "GT_PATH": f"{root}/test/y",
                          "LOAD_GT": True}},
        "AUGMENTOR": {"ENABLE": False},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
        "TRAIN": {"ENABLE": True, "EPOCHS": 25, "BATCH_SIZE": 4, "LR": 2.0e-3},
        "TEST": {"ENABLE": True},
    }
    job = BiaPy(cfg, result_dir=root + "/results", name="spjob", silent=True)
    job.run_job()
    assert job.workflow.mesh.shape == {"data": 4, "space": 2}
    iou = np.mean([m.get("iou", 0.0) for m in job.workflow.metrics_per_test_file])
    assert iou > 0.5, f"spatially-partitioned training failed to learn: {iou}"


def test_per_image_multichip_equals_single(tmp_path):
    """Per-image 3D inference slabs the volume in z across all local chips
    (VERDICT r2 #5) and must produce the IDENTICAL prediction as the
    single-chip whole-volume stitch — including a non-dividing z extent
    whose shifted final patch row averages with its predecessor."""
    import os

    import jax
    import numpy as np

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.norm import compute_norm_stats
    from biapy_tpu.data.tiff import write_tiff

    root = str(tmp_path)
    rng = np.random.default_rng(7)
    os.makedirs(f"{root}/x"); os.makedirs(f"{root}/y")
    vol = (rng.random((30, 32, 32)) * 255).astype(np.uint8)
    write_tiff(f"{root}/x/v.tif", vol)
    write_tiff(f"{root}/y/v.tif", (vol > 128).astype(np.uint8))
    job = BiaPy({
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"},
        "DATA": {"PATCH_SIZE": (12, 16, 16, 1),
                 "TRAIN": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y"},
                 "TEST": {"PATH": f"{root}/x", "GT_PATH": f"{root}/y",
                          "PADDING": (2, 2, 2), "OVERLAP": (0.0, 0.0, 0.0)}},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [2, 2],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [1, 1]},
        "TRAIN": {"ENABLE": True, "BATCH_SIZE": 1, "EPOCHS": 1},
        "TEST": {"ENABLE": True},
    }, result_dir=root + "/results", name="mc", silent=True)
    job._build_workflow()
    wf = job.workflow
    wf.prepare_model()

    img = vol[..., None]
    stats = compute_norm_stats(img, wf.test_norm_spec)
    # z=30, core=8 -> 4 rows, last shifted (30 % 8 != 0)
    multi = wf._predict_block_multichip(img, (0.0, 0.0, 0.0), (2, 2, 2), stats)
    assert multi is not None and multi.shape[0] == 30
    assert len(jax.local_devices()) >= 2  # conftest CPU mesh
    single = wf.predict_block_on_device(img, overlap=(0.0, 0.0, 0.0),
                                        padding=(2, 2, 2), norm_stats=stats)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=1e-5)
