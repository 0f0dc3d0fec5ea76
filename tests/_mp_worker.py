"""Worker for the real 2-process distributed test (tests/test_multiprocess.py).

Each process gets 2 simulated CPU devices (global mesh of 4) with gloo
cross-process collectives; rank is jax.process_index(), exactly as on a
multi-host TPU pod. The job trains a tiny 3D semantic net data-parallel
across both processes and runs by-chunks zarr inference with round-robin
tile ownership and a shared output store (reference analog: the 2-GPU
self-hosted CI runner in SURVEY.md §4 — here with honest separate
processes instead of threads).

Usage: python _mp_worker.py <rank> <port> <workdir>
"""

import os
import sys

rank, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# per-rank compile cache: concurrent first-compile writes from two fresh
# processes race on the shared default dir
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(root, f"cache_r{rank}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=rank)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biapy_tpu.data.tiff import write_tiff  # noqa: E402
from biapy_tpu.data.zarr_store import ZarrArray  # noqa: E402
from biapy_tpu.parallel import all_gather_objects  # noqa: E402

assert jax.process_count() == 2 and jax.device_count() == 4

# -- rank 0 builds the dataset; the allgather doubles as a barrier ----------
rng = np.random.default_rng(0)
vol = None
if rank == 0:
    os.makedirs(f"{root}/train/x"), os.makedirs(f"{root}/train/y")
    for i in range(8):
        img = rng.random((16, 48, 48), np.float32)
        msk = (img > 0.5).astype(np.uint8) * 255
        write_tiff(f"{root}/train/x/{i}.tif", (img * 255).astype(np.uint8))
        write_tiff(f"{root}/train/y/{i}.tif", msk)
    os.makedirs(f"{root}/test/x")
    vol = (rng.random((24, 64, 64), np.float32) * 255).astype(np.uint8)
    z = ZarrArray.create(f"{root}/test/x/vol.zarr", shape=vol.shape,
                         chunks=(8, 32, 32), dtype="u1",
                         compressor={"id": "zlib", "level": 1})
    z[:, :, :] = vol
all_gather_objects(rank)  # barrier: data visible to both ranks

from biapy_tpu._biapy import BiaPy  # noqa: E402

cfg = {
    "PROBLEM": {"TYPE": "SEMANTIC_SEG", "NDIM": "3D"},
    # dp x sp over real processes: the global device list is
    # (proc0_dev0, proc0_dev1, proc1_dev0, proc1_dev1), so the (2, 2) mesh
    # puts 'space' within a process and 'data' across them — the pod
    # topology (space over ICI, data over DCN)
    "SYSTEM": {"SPATIAL_PARTITIONS": 2},
    "DATA": {"PATCH_SIZE": (8, 16, 16, 1),
             "TRAIN": {"PATH": f"{root}/train/x", "GT_PATH": f"{root}/train/y",
                       "IN_MEMORY": True},
             "VAL": {"SPLIT_TRAIN": 0.25},
             "TEST": {"PATH": f"{root}/test/x", "LOAD_GT": False,
                      "PADDING": (2, 4, 4), "OVERLAP": (0, 0, 0)}},
    "AUGMENTOR": {"ENABLE": False},
    "MODEL": {"ARCHITECTURE": "unet", "FEATURE_MAPS": [4, 8],
              "DROPOUT_VALUES": [0.0, 0.0], "Z_DOWN": [1, 2],
              "YX_DOWN": [2, 2], "CONV_LAYERS": [2, 2]},
    "TRAIN": {"ENABLE": True, "EPOCHS": 3, "BATCH_SIZE": 4, "LR": 2.0e-3},
    "TEST": {"ENABLE": True,
             "BY_CHUNKS": {"ENABLE": True,
                           "WORKFLOW_PROCESS": {"ENABLE": True,
                                                "PATCHES_PER_TILE": [2, 2, 2]}}},
}
job = BiaPy(cfg, result_dir=f"{root}/results", name="mpjob", silent=rank != 0)
job.run_job()

# -- cross-rank invariants ---------------------------------------------------
# 1. identical parameters on every process after distributed training
leaves = jax.tree.leaves(job.workflow.state.params)
digest = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
digests = all_gather_objects(digest)
assert abs(digests[0] - digests[1]) < 1e-4, f"rank params diverged: {digests}"

# 2. both ranks owned a non-empty disjoint share of the tile grid and the
# shared output store has full coverage
import glob  # noqa: E402

zpaths = glob.glob(f"{root}/results/mpjob/**/raw_pred.zarr", recursive=True)
assert zpaths, f"rank {rank}: no by-chunks raw_pred.zarr written"
out = np.asarray(ZarrArray(zpaths[0])[:])
assert out.shape[:3] == (24, 64, 64), out.shape
# semantic sigmoid output: every voxel must have been written by exactly one
# rank's tiles (zeros would mean a dropped tile)
frac_written = float((out != 0).mean())
assert frac_written > 0.99, f"rank {rank}: incomplete coverage {frac_written}"

# 3. checkpoints are rank-0-only
ckpts = glob.glob(f"{root}/results/mpjob/checkpoints/*")
if rank == 0:
    assert ckpts, "rank 0 must write checkpoints"
gathered = all_gather_objects((rank, digest))
print(f"MPWORKER_OK rank={rank} written={frac_written:.4f} "
      f"digest={digest:.3f} peers={len(gathered)}", flush=True)
