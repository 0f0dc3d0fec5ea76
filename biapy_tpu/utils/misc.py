"""Runtime utilities: checkpointing, metric logging, seeding.

Reference analog: biapy/utils/misc.py (save_model:328, load_model_checkpoint:516,
get_checkpoint_path:463, MetricLogger:916, SmoothedValue:863, set_seed:272,
TensorboardLogger:760).

Checkpoints are orbax-free msgpack trees written atomically: a single
``.ckpt`` file holding {cfg_yaml, biapy_tpu_version, params, batch_stats,
opt_state?, epoch, model_build_kwargs} — same contract as the reference's
.pth (config embedded so a checkpoint alone can rebuild the workflow,
reference: _biapy.py:784-828). Rank-0-only writes.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import random
import tempfile
import time
from collections import defaultdict, deque
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

import biapy_tpu
from biapy_tpu.parallel import is_main_process

CKPT_EXT = ".ckpt"


def set_seed(seed: int = 42) -> np.random.Generator:
    """Seed python/numpy and return a Generator; JAX randomness is handled
    by explicit PRNG keys derived from the same seed (reference:
    misc.py:272 set_seed, including the seed+rank offset for data loading)."""
    seed = seed + jax.process_index()
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


# --------------------------------------------------------------------------
# checkpointing
# --------------------------------------------------------------------------
def save_model(
    cfg,
    checkpoint_dir: str,
    job_identifier: str,
    params,
    epoch: int,
    batch_stats=None,
    opt_state=None,
    model_build_kwargs: Optional[Dict] = None,
    metric: str = "",
) -> Optional[str]:
    """Write a checkpoint (rank 0 only). ``metric`` tags best checkpoints
    (reference: save_model, misc.py:328)."""
    if not is_main_process():
        return None
    os.makedirs(checkpoint_dir, exist_ok=True)
    tag = f"{job_identifier}-checkpoint-{metric if metric else str(epoch)}"
    path = os.path.join(checkpoint_dir, tag + CKPT_EXT)
    tree = {
        "cfg": cfg.dump() if hasattr(cfg, "dump") else json.dumps(cfg),
        "biapy_tpu_version": getattr(biapy_tpu, "__version__", "0.1"),
        "epoch": int(epoch),
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats) if batch_stats else {},
        # JSON-encoded: msgpack strict mode rejects tuples, and the kwargs are
        # plain config values anyway.
        "model_build_kwargs": json.dumps(model_build_kwargs or {}),
    }
    if opt_state is not None:
        try:
            tree["opt_state"] = serialization.to_state_dict(opt_state)
        except Exception as e:
            # a checkpoint without optimizer state silently restarts adam
            # moments/schedules on resume — say so
            print(f"WARNING: optimizer state could not be serialized and is "
                  f"NOT in the checkpoint (resume will reinitialize it): {e}")
    blob = serialization.msgpack_serialize(tree)
    fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".part")
    with os.fdopen(fd, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    # MODEL.OUT_CHECKPOINT_FORMAT='safetensors' additionally writes a flat
    # weights-only .safetensors for interchange (reference: save_model,
    # misc.py:406 — there it REPLACES the .pth; here the .ckpt still carries
    # the config/epoch so resume keeps working)
    if str(getattr(cfg.MODEL, "OUT_CHECKPOINT_FORMAT", "pth")) == "safetensors":
        try:
            from safetensors.numpy import save_file as _st_save

            flat = {}

            def _flatten(prefix, t):
                if isinstance(t, dict):
                    for k, v in t.items():
                        _flatten(f"{prefix}{k}." if prefix else f"{k}.", v) \
                            if isinstance(v, dict) else flat.__setitem__(
                                prefix + k, np.ascontiguousarray(np.asarray(v)))
                else:
                    flat[prefix.rstrip(".")] = np.ascontiguousarray(np.asarray(t))

            _flatten("", jax.tree.map(np.asarray, params))
            _st_save(flat, os.path.join(checkpoint_dir, tag + ".safetensors"))
        except Exception as e:
            print(f"safetensors export skipped: {e}")
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def get_checkpoint_path(cfg, job_identifier: str) -> Optional[str]:
    """Resolve which checkpoint to load: explicit path / 'best' / 'last' /
    epoch number (reference: get_checkpoint_path, misc.py:463)."""
    if cfg.PATHS.CHECKPOINT_FILE:
        return cfg.PATHS.CHECKPOINT_FILE
    d = cfg.PATHS.CHECKPOINT
    which = cfg.MODEL.LOAD_CHECKPOINT_EPOCH  # 'best_on_val' | 'last_on_train' | int
    candidates = sorted(glob.glob(os.path.join(d, f"{job_identifier}-checkpoint-*{CKPT_EXT}")))
    if not candidates:
        return None
    if which == "best_on_val":
        best = [c for c in candidates if c.endswith(f"-best{CKPT_EXT}")]
        if best:
            return best[0]
        which = "last_on_train"
    if which == "last_on_train":
        numbered = [(int(os.path.basename(c).rsplit("-", 1)[1][: -len(CKPT_EXT)]), c)
                    for c in candidates
                    if os.path.basename(c).rsplit("-", 1)[1][: -len(CKPT_EXT)].isdigit()]
        if numbered:
            return max(numbered)[1]
        return candidates[-1]
    tagged = os.path.join(d, f"{job_identifier}-checkpoint-{which}{CKPT_EXT}")
    return tagged if os.path.exists(tagged) else None


def apply_checkpoint_params(target_params, loaded_params, skip_unmatched: bool = True):
    """Merge loaded weights into the target tree, skipping shape-mismatched
    leaves when finetuning (reference: load_model_checkpoint partial loading,
    misc.py:516)."""
    merged_count = [0]
    skipped: List[str] = []

    def merge(path, tgt, sub):
        if isinstance(tgt, dict):
            out = {}
            for k, v in tgt.items():
                if isinstance(sub, dict) and k in sub:
                    out[k] = merge(path + (k,), v, sub[k])
                else:
                    if not skip_unmatched:
                        raise ValueError(
                            f"Checkpoint missing parameter {'/'.join(path + (k,))} "
                            "(set MODEL.SKIP_UNMATCHED_LAYERS to finetune across "
                            "architecture changes)")
                    skipped.append("/".join(path + (k,)))
                    out[k] = v
            return out
        arr = np.asarray(sub)
        if arr.shape == tuple(tgt.shape):
            merged_count[0] += 1
            return arr.astype(tgt.dtype) if hasattr(tgt, "dtype") else arr
        if not skip_unmatched:
            raise ValueError(f"Shape mismatch at {'/'.join(path)}: {arr.shape} vs {tgt.shape}")
        skipped.append("/".join(path))
        return tgt

    merged = merge((), target_params, loaded_params)
    if skipped and is_main_process():
        print(f"Checkpoint load: {merged_count[0]} tensors loaded, {len(skipped)} skipped "
              f"(first skipped: {skipped[:5]})")
    return merged


# --------------------------------------------------------------------------
# metric logging
# --------------------------------------------------------------------------
class SmoothedValue:
    """Windowed + global average tracker (reference: misc.py:863)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value, max=max(self.deque) if self.deque else 0.0,
        )


class MetricLogger:
    """Progress printer with ETA (reference: MetricLogger.log_every,
    misc.py:916-1054)."""

    def __init__(self, delimiter: str = "  ", verbose: bool = True):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.verbose = verbose and is_main_process()

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in ("meters", "delimiter", "verbose"):
            raise AttributeError(attr)
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        n = len(iterable) if hasattr(iterable, "__len__") else None
        end = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if self.verbose and (i % print_freq == 0 or (n and i == n - 1)):
                if n:
                    eta = iter_time.global_avg * (n - i - 1)
                    eta_s = str(datetime.timedelta(seconds=int(eta)))
                    print(f"{header} [{i}/{n}] eta: {eta_s} {self} time: {iter_time}")
                else:
                    print(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            end = time.time()
        total = time.time() - start
        if self.verbose:
            print(f"{header} Total time: {str(datetime.timedelta(seconds=int(total)))}")


class JsonLogger:
    """Append-per-epoch JSON-lines training log (reference:
    base_workflow.py:1173)."""

    def __init__(self, path: str):
        self.path = path
        if is_main_process():
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def write(self, record: Dict[str, Any]):
        if not is_main_process():
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class TensorboardLogger:
    """Minimal TensorBoard event writer (scalar-only). The reference wraps
    tensorboardX (misc.py:760); here events are written directly in the
    TF-record/event format so no dependency is needed."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.step = 0
        self._file = None
        if is_main_process():
            os.makedirs(log_dir, exist_ok=True)
            fname = f"events.out.tfevents.{int(time.time())}.biapy_tpu"
            self._file = open(os.path.join(log_dir, fname), "ab")
            self._write_event(0.0, 0, file_version="brain.Event:2")

    @staticmethod
    def _masked_crc(data: bytes) -> int:
        import zlib

        crc = zlib.crc32(data) & 0xFFFFFFFF
        return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF

    def _write_event(self, wall_time: float, step: int, file_version: str = "",
                     tag: str = "", value: float = 0.0):
        if self._file is None:
            return
        import struct

        # hand-rolled protobuf encoding for tensorflow.Event
        def key(field, wire):
            return bytes([(field << 3) | wire])

        body = key(1, 1) + struct.pack("<d", wall_time or time.time())
        if file_version:
            fv = file_version.encode()
            body += key(3, 2) + bytes([len(fv)]) + fv
        else:
            body += key(2, 0) + _varint(step)
            sv = key(1, 2)
            tag_b = tag.encode()
            val_b = key(1, 2) + bytes([len(tag_b)]) + tag_b + key(2, 5) + struct.pack("<f", value)
            summary = sv + _varint(len(val_b)) + val_b
            body += key(5, 2) + _varint(len(summary)) + summary
        hdr = struct.pack("<Q", len(body))
        self._file.write(hdr + struct.pack("<I", self._masked_crc(hdr)))
        self._file.write(body + struct.pack("<I", self._masked_crc(body)))
        self._file.flush()

    def update(self, step: Optional[int] = None, **kwargs):
        if self._file is None:
            return
        if step is not None:
            self.step = step
        else:
            self.step += 1
        for k, v in kwargs.items():
            if v is not None:
                self._write_event(time.time(), self.step, tag=k, value=float(v))

    def close(self):
        if self._file:
            self._file.close()
            self._file = None


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def to_device_format(img: np.ndarray) -> np.ndarray:
    """Identity layout hook: biapy_tpu keeps channels-last on device (the
    reference permutes to NCHW for torch, misc.py:689 to_pytorch_format;
    TPU prefers NHWC so no permute is needed)."""
    return img
