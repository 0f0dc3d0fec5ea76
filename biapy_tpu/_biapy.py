"""Top-level BiaPy job API.

Reference analog: biapy/_biapy.py (BiaPy:106 — job lifecycle: config
load/migrate/merge, device init, workflow build, train/test/predict/run_job;
build_config:1992; _Tee output routing:85).
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Any, Dict, List, Optional, Union

import numpy as np
import yaml

from biapy_tpu.config.config import CN, Config, update_dependencies
from biapy_tpu.config.migrate import convert_old_model_cfg_to_current_version
from biapy_tpu.engine.check_configuration import check_configuration
from biapy_tpu.parallel import initialize_distributed, is_main_process

VALID_WORKFLOWS = [
    "SEMANTIC_SEG",
    "INSTANCE_SEG",
    "DETECTION",
    "DENOISING",
    "SUPER_RESOLUTION",
    "SELF_SUPERVISED",
    "CLASSIFICATION",
    "IMAGE_TO_IMAGE",
]

_WORKFLOW_MODULES = {
    "SEMANTIC_SEG": ("biapy_tpu.engine.semantic_seg", "Semantic_Segmentation_Workflow"),
    "INSTANCE_SEG": ("biapy_tpu.engine.instance_seg", "Instance_Segmentation_Workflow"),
    "DETECTION": ("biapy_tpu.engine.detection", "Detection_Workflow"),
    "DENOISING": ("biapy_tpu.engine.denoising", "Denoising_Workflow"),
    "SUPER_RESOLUTION": ("biapy_tpu.engine.super_resolution", "Super_resolution_Workflow"),
    "SELF_SUPERVISED": ("biapy_tpu.engine.self_supervised", "Self_supervised_Workflow"),
    "CLASSIFICATION": ("biapy_tpu.engine.classification", "Classification_Workflow"),
    "IMAGE_TO_IMAGE": ("biapy_tpu.engine.image_to_image", "Image_to_Image_Workflow"),
}


class _Tee:
    """Mirror stdout/stderr into the per-run log file (reference: _biapy.py:85)."""

    def __init__(self, stream, logfile):
        self.stream = stream
        self.logfile = logfile

    def write(self, data):
        self.stream.write(data)
        self.logfile.write(data)

    def flush(self):
        self.stream.flush()
        self.logfile.flush()


def _enable_persistent_compile_cache():
    """XLA executables cached on disk across runs — repeat jobs with the same
    patch/model geometry skip the (20-40s on TPU, minutes for big nets)
    compile. Off with BIAPY_TPU_NO_COMPILE_CACHE=1; dir overridable via
    JAX_COMPILATION_CACHE_DIR."""
    if os.environ.get("BIAPY_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "biapy_tpu", "jax_cache")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # cache is best-effort; never block a job on it


class BiaPy:
    """One configured job: build from YAML path / dict / CN / checkpoint."""

    def __init__(
        self,
        config: Union[str, Dict, CN],
        result_dir: str = "",
        name: str = "my_2d_semantic_segmentation",
        run_id: int = 1,
        gpu: Optional[str] = None,
        dist_backend: str = "ici",
        silent: bool = False,
        check_data_paths: bool = True,
        **kwargs,
    ):
        self.job_identifier = name
        if "/" in name:
            raise ValueError("Job name can not contain / character")
        self.run_id = run_id
        result_dir = result_dir or os.getenv("HOME", ".")
        self.job_dir = os.path.join(result_dir, name)

        raw = self._load_raw_config(config)
        raw = convert_old_model_cfg_to_current_version(
            raw, verbose=raw.get("PROBLEM", {}).get("PRINT_OLD_KEY_CHANGES", True) and not silent
        )

        cfg_holder = Config(self.job_dir, self.job_identifier)
        self.cfg = cfg_holder.get_cfg_defaults()
        self.cfg.merge_from_dict(raw)
        if str(raw.get("MODEL", {}).get("SOURCE", "")).lower() == "bmz":
            # adapt the config to the BMZ package before validation: RDF-
            # derived opts win over the user YAML, each change printed, with
            # patch size only adopted when non-channel dims differ
            # (reference: check_bmz_args models/__init__.py:1119 applied in
            # base_workflow.py:330-357)
            from biapy_tpu.utils.bmz import check_bmz_args

            preproc, opts, _ = check_bmz_args(
                str(self.cfg.MODEL.BMZ.SOURCE_MODEL_ID), self.cfg)
            if preproc and not silent:
                print("[BMZ] Overriding preprocessing steps to the ones fixed "
                      f"in BMZ model: {preproc}")
            option_list: list = []
            for key, val in opts.items():
                node = self.cfg
                for p in key.split("."):
                    node = node[p]
                old = node

                def plain(v):
                    return list(plain(x) for x in v) if isinstance(v, (list, tuple)) else v

                if key == "DATA.PATCH_SIZE":
                    change = plain(old)[:-1] != plain(val)[:-1]
                else:
                    change = plain(old) != plain(val)
                if change:
                    if not silent:
                        print(f"[BMZ] Changed '{key}' from '{old}' to '{val}' "
                              "as defined in the RDF")
                    option_list += [key, val]
            self.cfg.merge_from_list(option_list)
        update_dependencies(self.cfg, self.job_dir, self.job_identifier)

        _enable_persistent_compile_cache()
        initialize_distributed()
        self._check_data_paths = bool(check_data_paths)
        check_configuration(self.cfg, self.job_identifier,
                            check_data_paths=check_data_paths)

        self._silent = silent
        self._tee_handles = None
        if not silent and is_main_process():
            # tee stdout/stderr into the per-run log file (reference: _Tee,
            # _biapy.py:85,315-325)
            os.makedirs(self.cfg.LOG.LOG_DIR, exist_ok=True)
            log_path = os.path.join(self.cfg.LOG.LOG_DIR,
                                    f"{self.cfg.LOG.LOG_FILE_PREFIX}_{run_id}.log")
            logfile = open(log_path, "a")
            sys.stdout = _Tee(sys.__stdout__, logfile)
            sys.stderr = _Tee(sys.__stderr__, logfile)
            self._tee_handles = logfile

        self.workflow = None

    # ------------------------------------------------------------------
    @staticmethod
    def _load_raw_config(config) -> Dict:
        if isinstance(config, CN):
            return config.to_dict()
        if isinstance(config, dict):
            return dict(config)
        if isinstance(config, str):
            if config.endswith((".yaml", ".yml")):
                with open(config) as f:
                    return yaml.safe_load(f) or {}
            if config.endswith(".ckpt"):
                from biapy_tpu.utils.misc import load_checkpoint

                ck = load_checkpoint(config)
                raw = yaml.safe_load(ck["cfg"]) or {}
                raw.setdefault("PATHS", {})["CHECKPOINT_FILE"] = config
                raw.setdefault("MODEL", {})["LOAD_CHECKPOINT"] = True
                return raw
            if config.endswith(".safetensors"):
                # reference parity: check_api.py asserts guidance here —
                # safetensors carries weights only, no embedded config
                raise ValueError(
                    "A .safetensors file only stores weights — it cannot rebuild a "
                    "workflow. Pass the matching .ckpt (config embedded), or a YAML "
                    "config with PATHS.CHECKPOINT_FILE pointing at a .ckpt.")
            raise ValueError(f"Config file must be .yaml/.yml/.ckpt: {config}")
        raise ValueError(f"Unsupported config type: {type(config)}")

    def _build_workflow(self):
        if self.workflow is not None:
            return
        wf = self.cfg.PROBLEM.TYPE
        mod_name, cls_name = _WORKFLOW_MODULES[wf]
        mod = importlib.import_module(mod_name)
        cls = getattr(mod, cls_name)
        self.cfg.freeze()
        self.workflow = cls(self.cfg, self.job_identifier, verbose=not self._silent)

    # ------------------------------------------------------------------
    def train(self):
        self._build_workflow()
        self.workflow.train()

    def test(self):
        self._build_workflow()
        self.workflow.test()

    def predict(self, image: np.ndarray, gt: Optional[np.ndarray] = None) -> List[Dict[str, Any]]:
        """In-memory inference; returns predictions without writing anything
        to disk (reference: BiaPy.predict, _biapy.py:932)."""
        self._build_workflow()
        cfg = self.workflow.cfg
        was_frozen = cfg.is_frozen()
        if was_frozen:
            cfg.defrost()
        cfg.TEST.ENABLE = True
        cfg.TEST.BY_CHUNKS.ENABLE = False
        if was_frozen:
            cfg.freeze()
        self.workflow.save_to_disk = False
        try:
            self.workflow.test(image=image, gt=gt)
            return list(self.workflow._predictions)
        finally:
            self.workflow.save_to_disk = True

    def print_config(self):
        """Full resolved configuration dump (reference: print_config,
        _biapy.py:450)."""
        print("Configuration details:")
        print(self.cfg)

    def _enabled_augmentations(self) -> List[str]:
        aug = self.cfg.AUGMENTOR
        flags = ("ZOOM", "ROT90", "RANDOM_ROT", "SHEAR", "SHIFT", "VFLIP", "HFLIP",
                 "ZFLIP", "ELASTIC", "G_BLUR", "MEDIAN_BLUR", "MOTION_BLUR", "GAMMA_CONTRAST",
                 "BRIGHTNESS", "CONTRAST", "DROPOUT", "CUTOUT", "CUTBLUR", "CUTMIX",
                 "CUTNOISE", "MISALIGNMENT", "MISSING_SECTIONS", "GRAYSCALE",
                 "CHANNEL_SHUFFLE", "GRIDMASK", "GAUSSIAN_NOISE", "POISSON_NOISE",
                 "SALT", "PEPPER", "SALT_AND_PEPPER")
        return [f for f in flags if getattr(aug, f, False)]

    def _enabled_postprocessing(self) -> List[str]:
        pp = self.cfg.TEST.POST_PROCESSING
        out = []
        if pp.MEDIAN_FILTER:
            out.append("median_filter")
        if pp.REMOVE_CLOSE_POINTS:
            out.append("remove_close_points")
        if pp.DET_WATERSHED:
            out.append("det_watershed")
        if pp.VORONOI_ON_MASK:
            out.append("voronoi_on_mask")
        if pp.MEASURE_PROPERTIES.ENABLE:
            out.append("measure_properties")
        if pp.INSTANCE_REFINEMENT.ENABLE:
            out.extend(str(o) for o in pp.INSTANCE_REFINEMENT.OPERATIONS)
        return out

    def print_train_info(self):
        """Concise training-config overview (reference: print_train_info,
        _biapy.py:580)."""
        cfg = self.cfg
        augs = self._enabled_augmentations()
        augs_desc = ("disabled" if not cfg.AUGMENTOR.ENABLE else
                     f"{len(augs)} ({', '.join(augs)})" if augs else "enabled (none selected)")
        lr = cfg.TRAIN.LR[0] if isinstance(cfg.TRAIN.LR, (list, tuple)) and \
            len(cfg.TRAIN.LR) else cfg.TRAIN.LR
        opt = cfg.TRAIN.OPTIMIZER[0] if isinstance(cfg.TRAIN.OPTIMIZER, (list, tuple)) and \
            len(cfg.TRAIN.OPTIMIZER) else cfg.TRAIN.OPTIMIZER
        print("BiaPy train configuration")
        for k, v in (("Enabled", cfg.TRAIN.ENABLE),
                     ("Model", cfg.MODEL.ARCHITECTURE),
                     ("Source", cfg.MODEL.SOURCE),
                     ("Patch size", tuple(cfg.DATA.PATCH_SIZE)),
                     ("Epochs", cfg.TRAIN.EPOCHS),
                     ("Learning rate", lr),
                     ("Optimizer", opt),
                     ("Batch size", cfg.TRAIN.BATCH_SIZE),
                     ("Augmentations", augs_desc)):
            print(f"  {k}: {v}")

    def print_test_info(self):
        """Concise inference-config overview (reference: print_test_info,
        _biapy.py:624)."""
        cfg = self.cfg
        gt_desc = f"yes ({cfg.DATA.TEST.GT_PATH})" if cfg.DATA.TEST.LOAD_GT else "no"
        pp = self._enabled_postprocessing()
        print("BiaPy test configuration")
        for k, v in (("Enabled", cfg.TEST.ENABLE),
                     ("Test data", cfg.DATA.TEST.PATH),
                     ("Ground truth", gt_desc),
                     ("Patch size", tuple(cfg.DATA.PATCH_SIZE)),
                     ("Overlap", tuple(cfg.DATA.TEST.OVERLAP)),
                     ("Padding", tuple(cfg.DATA.TEST.PADDING)),
                     ("Post-processing", ", ".join(pp) if pp else "none")):
            print(f"  {k}: {v}")

    def __repr__(self) -> str:
        return (f"BiaPy(workflow={self.cfg.PROBLEM.TYPE}, ndim={self.cfg.PROBLEM.NDIM}, "
                f"model={self.cfg.MODEL.ARCHITECTURE}, job={self.job_identifier})")

    def update_config(self, new_cfg: Dict, reset_workflow: bool = False) -> None:
        """Merge post-hoc config edits, re-derive dependent keys, and rebuild
        the workflow if requested (reference: BiaPy.update_config,
        _biapy.py:652)."""
        was_frozen = self.cfg.is_frozen()
        if was_frozen:
            self.cfg.defrost()
        self.cfg.merge_from_dict(convert_old_model_cfg_to_current_version(new_cfg, verbose=False))
        update_dependencies(self.cfg, self.job_dir, self.job_identifier)
        check_configuration(self.cfg, self.job_identifier,
                            check_data_paths=getattr(self, '_check_data_paths', True))
        if was_frozen:
            self.cfg.freeze()
        if reset_workflow:
            self.workflow = None

    @classmethod
    def load_workflow_from_model(cls, source: str, **kwargs) -> "BiaPy":
        """Build a ready-to-infer job from a trained model alone, inferring
        the workflow (reference: _biapy.py load_workflow_from_model:830-882):
        a ``.ckpt`` checkpoint carries its config embedded; a BMZ package
        (zip/dir) has its workflow and dimensionality inferred from the RDF
        via check_bmz_args."""
        import zipfile

        if isinstance(source, str) and (
                os.path.isdir(source) or zipfile.is_zipfile(source)):
            from biapy_tpu.utils.bmz import check_bmz_args

            _, _, workflow_info = check_bmz_args(source)
            workflow = workflow_info.get("workflow_type")
            if not workflow:
                raise ValueError(
                    f"Could not infer the workflow from the BMZ model '{source}'. "
                    "Build the configuration explicitly with build_config(...) "
                    "and pass it to BiaPy(...).")
            cfg_dict = {
                "PROBLEM": {"TYPE": workflow, "NDIM": workflow_info.get("ndim", "2D")},
                "MODEL": {"SOURCE": "bmz", "BMZ": {"SOURCE_MODEL_ID": source}},
                "TRAIN": {"ENABLE": False},
                "TEST": {"ENABLE": True},
                "DATA": {"TEST": {"LOAD_GT": False, "USE_VAL_AS_TEST": False}},
            }
            # no data configured yet — the workflow is fed via predict() or a
            # later update_config, so path existence is not checked here
            kwargs.setdefault("check_data_paths", False)
            return cls(cfg_dict, **kwargs)
        kwargs.setdefault("check_data_paths", False)
        return cls(source, **kwargs)

    def export_model_to_bmz(self, output_dir: Optional[str] = None,
                            reuse_original_bmz_config: Optional[bool] = None) -> str:
        """Package the trained model as a BioImage-Model-Zoo-style RDF zip
        (reference: export_model_to_bmz, _biapy.py:1012). With
        MODEL.BMZ.EXPORT.REUSE_BMZ_CONFIG (reference: run_job, _biapy.py:1915)
        the imported package's model card is carried over."""
        from biapy_tpu.utils.bmz import export_model_to_bmz

        self._build_workflow()
        if reuse_original_bmz_config is None:
            reuse_original_bmz_config = bool(self.cfg.MODEL.BMZ.EXPORT.REUSE_BMZ_CONFIG)
        return export_model_to_bmz(
            self.workflow, output_dir or self.cfg.PATHS.BMZ_EXPORT_PATH,
            reuse_original_bmz_config=reuse_original_bmz_config)

    def run_job(self):
        """train() then test() then optional BMZ export (reference: run_job,
        _biapy.py:1906)."""
        if self.cfg.TRAIN.ENABLE:
            self.train()
        if self.cfg.TEST.ENABLE:
            self.test()
        if self.cfg.MODEL.BMZ.EXPORT.ENABLE:
            self.export_model_to_bmz()
        if is_main_process() and not self._silent:
            print("FINISHED JOB {} !!".format(self.job_identifier))


def build_config(
    workflow: str,
    ndim: str = "2D",
    patch_size: Optional[tuple] = None,
    train_path: Optional[str] = None,
    train_gt_path: Optional[str] = None,
    val_split: float = 0.1,
    test_path: Optional[str] = None,
    test_gt_path: Optional[str] = None,
    model: Optional[str] = None,
    epochs: int = 20,
    batch_size: int = 2,
    **extra,
) -> Dict:
    """High-level kwargs -> config-override dict (reference: build_config,
    _biapy.py:1992)."""
    wf = workflow.upper()
    if wf not in VALID_WORKFLOWS:
        raise ValueError(f"workflow must be one of {VALID_WORKFLOWS}")
    cfg: Dict[str, Any] = {
        "PROBLEM": {"TYPE": wf, "NDIM": ndim.upper()},
        "DATA": {},
        "TRAIN": {"ENABLE": train_path is not None, "EPOCHS": epochs, "BATCH_SIZE": batch_size},
        "TEST": {"ENABLE": test_path is not None},
        "MODEL": {},
    }
    if patch_size:
        cfg["DATA"]["PATCH_SIZE"] = tuple(patch_size)
    if train_path:
        cfg["DATA"]["TRAIN"] = {"PATH": train_path, "IN_MEMORY": True}
        if train_gt_path:
            cfg["DATA"]["TRAIN"]["GT_PATH"] = train_gt_path
        cfg["DATA"]["VAL"] = {"SPLIT_TRAIN": val_split}
    if test_path:
        cfg["DATA"]["TEST"] = {"PATH": test_path, "IN_MEMORY": True, "LOAD_GT": test_gt_path is not None}
        if test_gt_path:
            cfg["DATA"]["TEST"]["GT_PATH"] = test_gt_path
    if model:
        cfg["MODEL"]["ARCHITECTURE"] = model
    for k, v in extra.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return cfg
