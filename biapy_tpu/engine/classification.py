"""Classification workflow.

Reference analog: biapy/engine/classification.py (Classification_Workflow:31,
498 LoC): image-level labels derived from per-class sub-directories, CE
loss, accuracy / top-5 accuracy metrics, confusion matrix at test time.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from biapy_tpu.data.dataset import BiaPyDataset, DataSample, DatasetFile
from biapy_tpu.data.generators import BatchLoader, PairDataset
from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
from biapy_tpu.data.norm import normalize_image
from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


def _fit_to_patch(img: np.ndarray, patch: tuple) -> np.ndarray:
    """Center-crop/pad spatial axes to the configured patch size (reference:
    the classification generator resizes/crops samples to DATA.PATCH_SIZE)."""
    nd = len(patch)
    if tuple(img.shape[:nd]) == tuple(patch):
        return img
    out = img
    for d in range(nd):
        diff = out.shape[d] - patch[d]
        if diff > 0:
            lo = diff // 2
            out = out[tuple([slice(None)] * d + [slice(lo, lo + patch[d])])]
        elif diff < 0:
            pad = [(0, 0)] * out.ndim
            pad[d] = (-diff // 2, -diff - (-diff // 2))
            out = np.pad(out, pad, mode="reflect")
    return out


def load_classification_dataset(path: str, is_3d: bool, in_memory: bool = True,
                                expected_classes: Optional[int] = None,
                                preprocess_cfg=None,
                                patch_size: Optional[tuple] = None) -> BiaPyDataset:
    """Scan a directory of per-class sub-directories (reference:
    classification.py load_train_data:248). ``preprocess_cfg`` applies the
    DATA.PREPROCESS pipeline (resize etc., reference run_checks Test19/21)
    and ``patch_size`` center-crops/pads each sample to the model input."""
    from biapy_tpu.data.pre_processing import preprocess_image

    class_dirs = sorted(d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d)))
    if expected_classes and len(class_dirs) != expected_classes:
        raise ValueError(
            f"Found {len(class_dirs)} class folders in {path} but DATA.N_CLASSES={expected_classes}"
        )
    ds = BiaPyDataset()
    for ci, cname in enumerate(class_dirs):
        for p in list_image_files(os.path.join(path, cname)):
            img = read_img_as_ndarray(p, is_3d=is_3d) if in_memory else None
            if img is not None:
                if preprocess_cfg is not None:
                    img = preprocess_image(preprocess_cfg, img, is_2d=not is_3d)
                if patch_size is not None:
                    img = _fit_to_patch(img, tuple(patch_size))
            ds.dataset_info.append(DatasetFile(path=p, shape=img.shape if img is not None else None,
                                               class_num=ci, class_name=cname))
            ds.sample_list.append(DataSample(fid=len(ds.dataset_info) - 1, img=img))
    if not ds.sample_list:
        raise FileNotFoundError(f"No class-organised images found in {path}")
    return ds


class _ClassifDataset(PairDataset):
    """PairDataset variant yielding (image, class label)."""

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        img, _ = self._load(idx)
        f = self.ds.dataset_info[self.ds.sample_list[idx].fid]
        img, _ = normalize_image(img, self.norm_spec, stats=f.norm_stats)
        if self.aug is not None:
            img, _ = self.aug(img, None, rng)
        return {"x": np.ascontiguousarray(img, dtype=np.float32),
                "y": np.asarray([f.class_num], dtype=np.float32)}


class Classification_Workflow(Base_Workflow):
    def define_activations_and_channels(self):
        self.n_classes = max(int(self.cfg.DATA.N_CLASSES), 2)
        self.output_channels = [self.n_classes]
        self.activations = ["linear"]
        self.output_channel_info = ["class"]

    def define_metrics(self):
        def loss(out, y):
            logits = out["class"] if isinstance(out, dict) else out
            return M.softmax_ce_with_logits(logits, y)

        self.loss = loss
        n5 = min(5, self.n_classes)
        self.train_metrics = {
            "accuracy": lambda out, y: M.accuracy_metric(out["class"] if isinstance(out, dict) else out, y),
        }
        if self.n_classes > 5:
            self.train_metrics["top_5_accuracy"] = lambda out, y: M.top_k_accuracy(
                out["class"] if isinstance(out, dict) else out, y.astype(jnp.int32), 5
            )

    # -- data -----------------------------------------------------------------
    def _build_loaders(self):
        cfg = self.cfg
        patch = tuple(cfg.DATA.PATCH_SIZE)[: self.nd]
        train_ds = load_classification_dataset(
            cfg.DATA.TRAIN.PATH, self.is_3d,
            in_memory=bool(cfg.DATA.TRAIN.IN_MEMORY),
            expected_classes=self.n_classes,
            preprocess_cfg=cfg.DATA.PREPROCESS if cfg.DATA.PREPROCESS.TRAIN else None,
            patch_size=patch)
        if not cfg.DATA.VAL.FROM_TRAIN:
            val_ds = load_classification_dataset(
                cfg.DATA.VAL.PATH, self.is_3d,
                preprocess_cfg=cfg.DATA.PREPROCESS if cfg.DATA.PREPROCESS.VAL else None,
                patch_size=patch)
        else:
            from biapy_tpu.data.data_manipulation import split_train_val

            train_ds, val_ds = split_train_val(
                train_ds, float(cfg.DATA.VAL.SPLIT_TRAIN), seed=cfg.SYSTEM.SEED,
                cross_val=bool(cfg.DATA.VAL.CROSS_VAL),
                cross_val_nsplits=int(cfg.DATA.VAL.CROSS_VAL_NFOLD),
                cross_val_fold=int(cfg.DATA.VAL.CROSS_VAL_FOLD))
        mk = lambda ds, aug: _ClassifDataset(ds, cfg, self.norm_spec, augment=aug,
                                             n_classes=self.n_classes, seed=cfg.SYSTEM.SEED)
        return mk(train_ds, True), mk(val_ds, False)

    def train(self):
        import math
        import time

        from biapy_tpu.engine.train_engine import make_eval_step, make_train_step
        from biapy_tpu.parallel import data_axis_size, shard_batch
        from biapy_tpu.utils.callbacks import EarlyStopping
        from biapy_tpu.utils.misc import JsonLogger, MetricLogger, save_model

        cfg = self.cfg
        train_data, val_data = self._build_loaders()
        ndev = data_axis_size(self.mesh)
        gbs = int(math.ceil(max(int(cfg.TRAIN.BATCH_SIZE), ndev) / ndev) * ndev)
        train_loader = BatchLoader(train_data, gbs, shuffle=True, seed=cfg.SYSTEM.SEED)
        val_loader = BatchLoader(val_data, gbs, shuffle=False, seed=cfg.SYSTEM.SEED)
        self._steps_per_epoch = len(train_loader)
        self.prepare_model()
        from biapy_tpu.engine.train_engine import resolve_mixed_precision

        train_step = make_train_step(
            self.loss, self.train_metrics, mesh=self.mesh,
            mixed_precision=resolve_mixed_precision(cfg.TRAIN.MIXED_PRECISION))
        eval_step = make_eval_step(self.loss, self.train_metrics, mesh=self.mesh)
        early = EarlyStopping(patience=int(cfg.TRAIN.PATIENCE)) if cfg.TRAIN.PATIENCE >= 0 else None
        jsonlog = JsonLogger(os.path.join(cfg.LOG.LOG_DIR, f"{self.job_identifier}_train.jsonl"))
        key = jax.random.PRNGKey(cfg.SYSTEM.SEED)
        best_val = float("inf")
        for epoch in range(self.start_epoch, int(cfg.TRAIN.EPOCHS)):
            t0 = time.time()
            train_loader.set_epoch(epoch)
            logger = MetricLogger(verbose=self.verbose)
            for batch in logger.log_every(train_loader, 10, header=f"Epoch: [{epoch}]"):
                self.state, mtr = train_step(self.state, shard_batch(batch, self.mesh), key)
                logger.update(**{k: float(v) for k, v in mtr.items()})
            record = {"epoch": epoch, **{k: m.global_avg for k, m in logger.meters.items()}}
            vals: Dict[str, List[float]] = {}
            for batch in val_loader:
                mtr = eval_step(self.state, shard_batch(batch, self.mesh))
                for k, v in mtr.items():
                    vals.setdefault(k, []).append(float(v))
            record.update({("val_" + k): float(np.mean(v)) for k, v in vals.items()})
            if record.get("val_loss", np.inf) < best_val:
                best_val = record["val_loss"]
                save_model(cfg, cfg.PATHS.CHECKPOINT, self.job_identifier, self.state.params,
                           epoch, self.state.batch_stats, model_build_kwargs=self.model_build_kwargs,
                           metric="best")
            record["time"] = time.time() - t0
            jsonlog.write(record)
            if self.verbose:
                print(f"Epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in record.items()
                                                    if isinstance(v, float)))
            if early is not None and early(record.get("val_loss", np.inf)):
                break
        self.val_stats = {k: v for k, v in record.items() if isinstance(v, (int, float))}

    # -- test -----------------------------------------------------------------
    def test(self, image=None, gt=None):
        cfg = self.cfg
        self._predictions = []
        self._ensure_model_for_test()
        if image is not None:
            from biapy_tpu.data.io import ensure_channels_last

            imgs = [ensure_channels_last(np.asarray(image), self.nd)]
            labels = [int(gt) if gt is not None else -1]
            names = ["in_memory"]
        else:
            ds = load_classification_dataset(
                cfg.DATA.TEST.PATH, self.is_3d,
                preprocess_cfg=cfg.DATA.PREPROCESS if cfg.DATA.PREPROCESS.TEST else None,
                patch_size=tuple(cfg.DATA.PATCH_SIZE)[: self.nd])
            imgs, labels, names = [], [], []
            for s in ds.sample_list:
                f = ds.dataset_info[s.fid]
                imgs.append(s.img if s.img is not None else read_img_as_ndarray(f.path, self.is_3d))
                labels.append(f.class_num if cfg.DATA.TEST.LOAD_GT else -1)
                names.append(os.path.basename(f.path))
        preds = []
        for img in imgs:
            x, _ = normalize_image(img, self.norm_spec)
            out = self.predict_patches(x[None])
            preds.append(np.argmax(out[0]))
            self._predictions.append({"role": "class", "pred": out[0], "file": names[len(preds) - 1]})
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        if (labels >= 0).any():
            mask = labels >= 0
            acc = float((preds[mask] == labels[mask]).mean())
            self.stats = {"accuracy": acc}
            if self.verbose:
                print(f"Test accuracy: {acc:.6f}")
                n = self.n_classes
                conf = np.zeros((n, n), dtype=int)
                for p, l in zip(preds[mask], labels[mask]):
                    conf[l, p] += 1
                print("Confusion matrix (rows=true):")
                print(conf)
        if self.save_to_disk:
            import csv

            os.makedirs(cfg.PATHS.RESULT_DIR.PATH, exist_ok=True)
            with open(os.path.join(cfg.PATHS.RESULT_DIR.PATH, "predictions.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["filename", "class"])
                for nme, p in zip(names, preds):
                    w.writerow([nme, int(p)])

    def _predict_fn(self):
        def apply_cls(variables, x, train=False):
            out = self.model.apply(variables, x, train=False)
            logits = out["class"] if isinstance(out, dict) else out
            return jax.nn.softmax(logits, axis=-1)

        from biapy_tpu.engine.train_engine import make_predict_fn

        return make_predict_fn(apply_cls, mesh=self.mesh)
