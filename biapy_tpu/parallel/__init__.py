"""Device mesh, sharding helpers and distributed runtime.

Reference analog: biapy/utils/misc.py:160-269 (init_devices,
dist.init_process_group, rank helpers) and the DDP wrapping in
base_workflow.py:942-948.

TPU-native mapping: instead of one process per GPU with NCCL process groups,
a single program lays out a ``jax.sharding.Mesh`` over all local+remote
devices; data parallelism is expressed as a 'data'-sharded batch under
``jit``, and XLA GSPMD inserts the gradient all-reduces over ICI/DCN.
Multi-host jobs call ``jax.distributed.initialize`` once; everything else is
unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (reference analog: init_devices/misc.py:160).

    On single-host (the common case, incl. CI) this is a no-op. On SLURM/GKE
    the arguments are auto-detected by jax.distributed.
    """
    want_dist = (
        coordinator_address is not None
        or os.environ.get("SLURM_NTASKS", "1") not in ("", "1")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if want_dist and jax.process_count() <= 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # launcher already initialized the runtime (e.g. a test harness
            # or notebook that called jax.distributed.initialize itself)
            if "already initialized" not in str(e):
                raise


def get_mesh(devices: Optional[Sequence[jax.Device]] = None,
             axis_names: Sequence[str] = (DATA_AXIS,), spatial: int = 1) -> Mesh:
    """1-D data mesh over all devices by default; ``spatial > 1`` builds a
    2-D ``(data, space)`` mesh instead — the 'space' axis shards the
    patch's Y dimension under GSPMD (XLA inserts the conv halo exchanges),
    so one training patch can span several chips' HBM. A TPU-native
    extension with no reference analog (the torch build is DDP-only)."""
    if devices is None:
        devices = jax.devices()
    dev_arr = np.array(devices)
    spatial = max(1, int(spatial))
    if spatial > 1:
        if len(devices) % spatial:
            raise ValueError(f"SYSTEM.SPATIAL_PARTITIONS={spatial} must divide "
                             f"the device count ({len(devices)})")
        dev_arr = dev_arr.reshape(len(devices) // spatial, spatial)
        return Mesh(dev_arr, axis_names=(DATA_AXIS, SPACE_AXIS))
    if len(axis_names) > 1:
        raise NotImplementedError("multi-axis meshes are built by callers that need them")
    return Mesh(dev_arr, axis_names=tuple(axis_names))


def data_axis_size(mesh: Mesh) -> int:
    """Devices along the batch axis — what the global batch must tile."""
    return int(mesh.shape[DATA_AXIS])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh, spatial_dim: int) -> NamedSharding:
    """Batch over 'data' + the given array dim over 'space' (the patch's Y:
    dim 1 in NHWC, dim 2 in NDHWC); trailing dims replicated."""
    spec = (DATA_AXIS,) + (None,) * (spatial_dim - 1) + (SPACE_AXIS,)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, spatial_dim: Optional[int] = None) -> Any:
    """Place a host batch (pytree of numpy arrays) onto the mesh, sharded on
    the leading axis (batch size must divide the data-axis size). With
    ``spatial_dim`` on a (data, space) mesh, image-shaped leaves are also
    sharded along that dim; leaves it doesn't divide stay data-sharded."""
    sh = batch_sharding(mesh)
    if spatial_dim is None or SPACE_AXIS not in mesh.axis_names:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    sp = int(mesh.shape[SPACE_AXIS])
    ssh = spatial_sharding(mesh, spatial_dim)

    def put(x):
        ok = (getattr(x, "ndim", 0) > spatial_dim
              and x.shape[spatial_dim] % sp == 0)
        return jax.device_put(x, ssh if ok else sh)

    return jax.tree.map(put, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to(batch: Dict[str, np.ndarray], size: int) -> Dict[str, np.ndarray]:
    """Pad the leading axis to ``size`` by repeating the last sample
    (reference analog: duplicate-sample padding, base_workflow.py:2530)."""

    def pad(x):
        n = x.shape[0]
        if n == size:
            return x
        reps = np.repeat(x[-1:], size - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    return {k: pad(v) for k, v in batch.items()}


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()


def device_count() -> int:
    return jax.device_count()


def broadcast_from_main(obj: Any) -> Any:
    """Host-side object broadcast over DCN (reference analog:
    dist.broadcast_object_list; used by the chunked instance merge)."""
    if jax.process_count() <= 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj)


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (reference analog:
    dist.barrier, used around rank-0 checkpoint writes — misc.py:389)."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj: Any) -> list:
    """Gather a picklable object from every process (reference analog:
    dist.all_gather_object). Objects are exchanged as length-padded pickle
    byte arrays so ranks may hold arbitrarily different structures (ragged
    per-tile lists, empty dicts on tile-less ranks) — process_allgather on
    the raw pytree would require identical structure/shapes everywhere."""
    if jax.process_count() <= 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.asarray([buf.size], np.int64))
    ).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(len(sizes))]


def parallel_device_get(arr, out: Optional[np.ndarray] = None, streams: int = 32,
                        dtype=None) -> np.ndarray:
    """Device->host transfer of one array over several concurrent streams.

    Some TPU transports (e.g. tunneled PJRT) cap per-stream D2H bandwidth far
    below the link total; slicing the array along axis 0 and pulling the
    slices from worker threads multiplies aggregate throughput (measured on
    the axon tunnel: ~2 MB/s on one stream, ~34 MB/s on 8, plateau ~79 MB/s
    from 32 streams). Falls back to a plain transfer for small arrays.
    ``out`` (optional, preallocated, matching shape) receives the data;
    dtype conversion happens on host.
    """
    import concurrent.futures

    n0 = arr.shape[0]
    if out is None:
        out = np.empty(arr.shape, dtype or arr.dtype)
    streams = max(1, min(streams, n0))
    if streams == 1 or arr.size * arr.dtype.itemsize < 4 << 20:
        out[...] = np.asarray(jax.device_get(arr))
        return out
    bounds = np.linspace(0, n0, streams + 1).astype(int)
    slices = [arr[bounds[i]:bounds[i + 1]] for i in range(streams) if bounds[i] < bounds[i + 1]]
    for s in slices:
        s.block_until_ready()

    def pull(i):
        s = slices[i]
        out[bounds[i]:bounds[i] + s.shape[0]] = np.asarray(jax.device_get(s))

    with concurrent.futures.ThreadPoolExecutor(max_workers=len(slices)) as ex:
        list(ex.map(pull, range(len(slices))))
    return out
