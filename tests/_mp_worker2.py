"""Scenario worker for the real 2-process distributed matrix
(tests/test_multiprocess.py). Each scenario pins one cross-process behavior
the thread-simulated suites cannot: the 5-pass instance merge with ragged
per-rank edge lists, `all_gather_objects` with wildly different payload
sizes/types, and checkpoint-resume of a distributed training job.

Usage: python _mp_worker2.py <scenario> <rank> <port> <workdir>
"""

import os
import sys

scenario, rank, port, root = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(root, f"cache_r{rank}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=rank)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biapy_tpu.parallel import all_gather_objects  # noqa: E402

assert jax.process_count() == 2


def scenario_gather():
    """all_gather_objects with wildly different per-rank payloads (VERDICT
    round-1 #10): a multi-MB nested array vs a short string, then swapped —
    exercises the padded-pickle allgather's max-length negotiation both ways.
    """
    big = {"arr": np.arange(400_000, dtype=np.float64),  # ~3.2 MB
           "nested": [{"k": [1, 2, 3]}, ("t", 4.5)]}
    small = "tiny"
    mine = big if rank == 0 else small
    got = all_gather_objects(mine)
    assert isinstance(got[1], str) and got[1] == "tiny"
    assert np.array_equal(got[0]["arr"], big["arr"] if rank == 0
                          else np.arange(400_000, dtype=np.float64))
    assert got[0]["nested"][1] == ("t", 4.5)
    # swap roles: the previous max payload length must not poison round 2
    mine = small if rank == 0 else big
    got = all_gather_objects(mine)
    assert got[0] == "tiny" and len(got[1]["arr"]) == 400_000
    # empty payloads
    got = all_gather_objects([] if rank == 0 else None)
    assert got[0] == [] and got[1] is None
    print(f"MPWORKER_OK rank={rank} scenario=gather digest=0", flush=True)


def scenario_merge():
    """5-pass distributed instance merge with RAGGED per-rank edges: a
    synthetic prediction volume whose objects straddle tile boundaries
    asymmetrically, so one rank contributes many boundary edges and the
    other almost none (reference analog: Pass C/D of instance_seg.py:1915).
    """
    from scipy import ndimage

    from biapy_tpu.data.zarr_store import ZarrArray
    from biapy_tpu.engine.chunked import ChunkedInference

    shape = (24, 48, 48)
    if rank == 0:
        vol = np.zeros(shape + (1,), np.float32)
        # tile grid: tile_size (8,16,16) -> boundaries at z=8,16 y=16,32
        # x=16,32. Object A crosses the y=16 boundary (one merge edge).
        vol[2:6, 12:20, 6:14, 0] = 1.0
        # three disjoint objects (separated by z gaps) all crossing the x=16
        # boundary in the SAME low-y column of tiles — their edges
        # concentrate on one rank's tiles (ragged per-rank edge lists)
        for z0 in (8, 12, 16):
            vol[z0:z0 + 3, 2:8, 12:20, 0] = 1.0
        # object fully inside one tile (no edges)
        vol[18:22, 34:40, 34:40, 0] = 1.0
        os.makedirs(f"{root}/pred", exist_ok=True)
        z = ZarrArray.create(f"{root}/pred/raw.zarr", shape=vol.shape,
                             chunks=(8, 24, 24, 1), dtype="f4",
                             compressor={"id": "zlib", "level": 1})
        z[...] = vol
    all_gather_objects(rank)  # barrier: store visible to both ranks

    def instance_fn(p):
        lab, _ = ndimage.label(p[..., 0] > 0.5)
        return lab.astype(np.int32)

    os.makedirs(f"{root}/out_r", exist_ok=True)
    ci = ChunkedInference(workflow=None, patch_size=(8, 24, 24),
                         overlap=(0, 0, 0), padding=(2, 4, 4),
                         patches_per_tile=(2, 1, 1), out_channels=1,
                         out_dir=f"{root}/out_r", rank=rank, world=2)
    out_path = ci.create_and_merge_instances(
        f"{root}/pred/raw.zarr", instance_fn, merge_iou_th=0.2, verbose=False)
    labels = np.asarray(ZarrArray(out_path)[:])

    # every connected component got exactly ONE global id (the oracle is a
    # whole-volume labeling)
    ref, n_ref = ndimage.label(labels > 0)
    ids = set()
    for i in range(1, n_ref + 1):
        got = np.unique(labels[ref == i])
        got = got[got > 0]
        assert len(got) == 1, f"component {i} has ids {got}"
        ids.add(int(got[0]))
    assert len(ids) == n_ref, (len(ids), n_ref)
    assert n_ref == 5, n_ref  # A + 3 cluster objects + isolated
    print(f"MPWORKER_OK rank={rank} scenario=merge digest={n_ref}", flush=True)


def scenario_resume():
    """Distributed checkpoint-resume: train 2 epochs, rebuild from the
    checkpoint with more epochs, confirm the resume starts at epoch 2 on
    BOTH ranks and parameters stay in sync (reference: epoch resume,
    misc.py:516 + SURVEY §5.3)."""
    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(1)
    if rank == 0:
        os.makedirs(f"{root}/train/x"), os.makedirs(f"{root}/train/y")
        for i in range(8):
            img = rng.random((32, 32), np.float32)
            write_tiff(f"{root}/train/x/{i}.tif", (img * 255).astype(np.uint8))
            write_tiff(f"{root}/train/y/{i}.tif",
                       ((img > 0.5) * 255).astype(np.uint8))
    all_gather_objects(rank)

    cfg = {
        "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "2D"},
        "DATA": {"PATCH_SIZE": (16, 16, 1),
                 "TRAIN": {"PATH": f"{root}/train/x",
                           "GT_PATH": f"{root}/train/y", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.25}},
        "AUGMENTOR": {"ENABLE": False},
        "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
                  "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [1, 1],
                  "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
        "TRAIN": {"ENABLE": True, "EPOCHS": 2, "BATCH_SIZE": 4, "LR": 1.0e-3},
        "TEST": {"ENABLE": False},
    }
    job = BiaPy(cfg, result_dir=f"{root}/results", name="resjob",
                silent=rank != 0)
    job.run_job()
    all_gather_objects(rank)  # checkpoint visible everywhere

    cfg2 = dict(cfg)
    cfg2["TRAIN"] = {"ENABLE": True, "EPOCHS": 4, "BATCH_SIZE": 4, "LR": 1.0e-3}
    cfg2["MODEL"] = dict(cfg["MODEL"],
                         LOAD_CHECKPOINT=True,
                         LOAD_CHECKPOINT_EPOCH="last_on_train",
                         ITEMS_TO_LOAD_FROM_CHECKPOINT=["weights", "optimizer",
                                                        "epoch"])
    job2 = BiaPy(cfg2, result_dir=f"{root}/results", name="resjob",
                 silent=rank != 0)
    job2._build_workflow()
    job2.workflow.prepare_model()
    assert job2.workflow.start_epoch == 2, job2.workflow.start_epoch
    job2.workflow.train()

    leaves = jax.tree.leaves(job2.workflow.state.params)
    digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
    digests = all_gather_objects(digest)
    assert abs(digests[0] - digests[1]) < 1e-4, digests
    print(f"MPWORKER_OK rank={rank} scenario=resume digest={digest:.3f}",
          flush=True)


{"gather": scenario_gather, "merge": scenario_merge,
 "resume": scenario_resume}[scenario]()
