"""BioImage Model Zoo (BMZ) export.

Reference analog: biapy/_biapy.py export_model_to_bmz:1012 +
models/bmz_utils.py (811 LoC): package the trained model as an RDF zip —
rdf.yaml model description, weights, test input/output tensors, cover
image, documentation, sha256 sums.

This implementation writes a spec-shaped bioimageio RDF (format 0.5) with
the model weights in biapy_tpu's native msgpack format (declared under
``weights.keras_hdf5``-style custom key is not allowed, so we use the
``pytorch_state_dict``-equivalent slot only when a converted state dict is
available — for now weights ship under ``attachments`` with a clear note;
torch-format conversion is a tracked gap). The test tensors are real
forward-pass outputs so a downstream consumer can verify numerics.
"""

from __future__ import annotations

import hashlib
import json
import os
import zipfile
from typing import Optional

import numpy as np
import yaml

import biapy_tpu


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _extract_bmz_package(source: str, workdir: Optional[str] = None) -> str:
    """Resolve a BMZ source (zip path or unpacked dir) to a directory holding
    rdf.yaml (reference analog: check_bmz_args, models/__init__.py:1119)."""
    import tempfile

    if os.path.isdir(source):
        if not os.path.exists(os.path.join(source, "rdf.yaml")):
            raise FileNotFoundError(f"No rdf.yaml in BMZ directory {source}")
        return source
    if zipfile.is_zipfile(source):
        out = workdir or tempfile.mkdtemp(prefix="bmz_")
        with zipfile.ZipFile(source) as z:
            z.extractall(out)
        if not os.path.exists(os.path.join(out, "rdf.yaml")):
            raise FileNotFoundError(f"No rdf.yaml inside BMZ zip {source}")
        return out
    raise ValueError(
        f"BMZ source '{source}' is neither a package dir nor a zip. Remote "
        "zoo IDs need network access, which this environment does not have — "
        "download the package zip and pass its path.")


def read_bmz_rdf(source: str) -> dict:
    """Load the rdf.yaml of a BMZ package (zip or dir)."""
    root = _extract_bmz_package(source)
    with open(os.path.join(root, "rdf.yaml")) as f:
        rdf = yaml.safe_load(f)
    rdf["_root"] = root
    return rdf


def check_bmz_args(source: str, cfg) -> dict:
    """Validate a BMZ package against the current config and return the
    config overrides it implies (reference: check_bmz_args,
    models/__init__.py:1119 + compatibility check :1176).

    For biapy_tpu-exported packages the embedded config's MODEL section is
    returned so the exact architecture is rebuilt; for external packages the
    user's MODEL section must describe the architecture and only weight
    loading is attempted."""
    rdf = read_bmz_rdf(source)
    if rdf.get("type") != "model":
        raise ValueError(f"BMZ RDF at {source} is type '{rdf.get('type')}', not 'model'")
    overrides: dict = {}
    emb = rdf.get("config", {}).get("biapy_tpu", {}).get("cfg")
    if emb:
        if emb.get("PROBLEM", {}).get("TYPE") not in ("", None, cfg.PROBLEM.TYPE):
            print(f"BMZ package was trained for {emb['PROBLEM']['TYPE']}; "
                  f"current workflow is {cfg.PROBLEM.TYPE} (weights load anyway)")
        overrides["MODEL"] = {k: v for k, v in emb.get("MODEL", {}).items() if k != "SOURCE"}
        overrides["DATA"] = {"PATCH_SIZE": emb.get("DATA", {}).get("PATCH_SIZE",
                                                                   list(cfg.DATA.PATCH_SIZE))}
    return overrides


def _torch_tensor_to_flax(t_np: np.ndarray, flax_shape: tuple) -> Optional[np.ndarray]:
    """Convert one torch tensor to a flax layout if shapes can correspond:
    convs OI(D)HW -> (D)HWIO, linear (O,I) -> (I,O), 1-D params as-is."""
    if tuple(t_np.shape) == tuple(flax_shape):
        return t_np
    if t_np.ndim >= 3:  # conv kernel
        perm = tuple(range(2, t_np.ndim)) + (1, 0)
        c = np.transpose(t_np, perm)
        if tuple(c.shape) == tuple(flax_shape):
            return c
    if t_np.ndim == 2:
        c = t_np.T
        if tuple(c.shape) == tuple(flax_shape):
            return c
    return None


def import_torch_state_dict(state_dict: dict, params, batch_stats=None):
    """Map a torch state dict onto a flax param tree (reference analog: BMZ
    pytorch_state_dict import, models/__init__.py:943 build_bmz_model).

    Two strategies, tried in order:

    1. **Module-structured matching**: group torch tensors by module prefix
       (``enc.0.conv.weight`` -> module ``enc.0.conv``) and flax leaves by
       parent path; match whole modules in registration order against flax
       modules in flatten order, requiring every tensor to land on its
       role-equivalent name (``weight``(ndim>=2)->``kernel``,
       ``weight``(1-D)->``scale``, ``bias``->``bias``) with a layout-
       compatible shape. This is immune to the scale/bias swap an ordered
       matcher suffers (torch emits gamma before beta; sorted flax order is
       bias before scale — identical shapes) and carries BN running stats to
       exactly the matched module.
    2. **Ordered shape matching** (fallback for exotic naming): for each
       torch tensor in registration order, the first unplaced flax leaf with
       a layout-compatible shape.
    """
    try:
        return _import_torch_module_matched(state_dict, params, batch_stats)
    except ValueError:
        return _import_torch_ordered(state_dict, params, batch_stats)


def _leaf_key(k) -> str:
    return str(getattr(k, "key", getattr(k, "idx", k)))


def _import_torch_module_matched(state_dict: dict, params, batch_stats=None):
    """Whole-module name/shape matching; raises ValueError when the state
    dict does not decompose into role-mappable modules."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves = [leaf for _, leaf in flat]
    fmods: dict = {}
    forder: list = []
    for i, (path, leaf) in enumerate(flat):
        keys = [_leaf_key(k) for k in path]
        mod, name = "/".join(keys[:-1]), keys[-1]
        if mod not in fmods:
            fmods[mod] = {}
            forder.append(mod)
        fmods[mod][name] = i

    tmods: dict = {}
    torder: list = []
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        mod, _, name = k.rpartition(".")
        if mod not in tmods:
            tmods[mod] = {}
            torder.append(mod)
        tmods[mod][name] = np.asarray(v)

    def flax_role(name: str, t: np.ndarray) -> Optional[str]:
        if name == "weight":
            return "kernel" if t.ndim >= 2 else "scale"
        if name in ("bias", "scale", "kernel"):
            return name
        return None

    used = [False] * len(forder)
    new_leaves: list = [None] * len(leaves)
    mod_map: dict = {}  # torch module -> flax module path
    for tm in torder:
        tensors = {n: t for n, t in tmods[tm].items()
                   if n not in ("running_mean", "running_var")}
        wanted = {}
        for n, t in tensors.items():
            role = flax_role(n, t)
            if role is None:
                raise ValueError(f"unmappable torch tensor name '{tm}.{n}'")
            wanted[role] = t
        placed = False
        for j, fm in enumerate(forder):
            if used[j] or set(fmods[fm]) != set(wanted):
                continue
            conv = {r: _torch_tensor_to_flax(t, leaves[fmods[fm][r]].shape)
                    for r, t in wanted.items()}
            if any(c is None for c in conv.values()):
                continue
            for r, c in conv.items():
                new_leaves[fmods[fm][r]] = c.astype(np.float32)
            used[j] = True
            mod_map[tm] = fm
            placed = True
            break
        if not placed and wanted:
            raise ValueError(f"no flax module matches torch module '{tm}' "
                             f"{[(n, t.shape) for n, t in tensors.items()]}")
    if any(l is None for l in new_leaves):
        raise ValueError("torch state dict leaves some model parameters unset")
    new_params = jax.tree.unflatten(jax.tree.structure(params), new_leaves)

    new_stats = batch_stats
    if batch_stats:
        s_flat = jax.tree_util.tree_flatten_with_path(batch_stats)[0]
        s_index = {}
        for i, (path, leaf) in enumerate(s_flat):
            keys = [_leaf_key(k) for k in path]
            s_index["/".join(keys[:-1]) + ":" + keys[-1]] = i
        s_leaves = [leaf for _, leaf in s_flat]
        for tm, fm in mod_map.items():
            for tname, fname in (("running_mean", "mean"), ("running_var", "var")):
                if tname in tmods[tm]:
                    i = s_index.get(fm + ":" + fname)
                    if i is None:
                        raise ValueError(f"no batch stat '{fm}:{fname}' for '{tm}.{tname}'")
                    t = tmods[tm][tname]
                    if tuple(t.shape) != tuple(s_leaves[i].shape):
                        raise ValueError(f"BN stat '{tm}.{tname}' {t.shape} != "
                                         f"{s_leaves[i].shape}")
                    s_leaves[i] = t.astype(np.float32)
        new_stats = jax.tree.unflatten(jax.tree.structure(batch_stats), s_leaves)
    return new_params, new_stats


def _import_torch_ordered(state_dict: dict, params, batch_stats=None):
    """Ordered shape-compatible matching: works when the torch registration
    order matches the flax flatten order for equal-shape groups."""
    import jax

    bn_stats_keys = ("running_mean", "running_var")
    torch_items = [(k, np.asarray(v)) for k, v in state_dict.items()
                   if not k.endswith("num_batches_tracked")]
    main_items = [(k, v) for k, v in torch_items if not k.endswith(bn_stats_keys)]
    stat_items = [(k, v) for k, v in torch_items if k.endswith(bn_stats_keys)]

    leaves, treedef = jax.tree.flatten(params)
    if len(main_items) != len(leaves):
        raise ValueError(f"BMZ torch state dict has {len(main_items)} tensors but "
                         f"the model expects {len(leaves)} parameters")
    # Greedy ordered matching: for each torch tensor (registration order),
    # take the first unplaced flax leaf with a layout-compatible shape.
    # jax.tree.flatten orders leaves by sorted key, which need not equal
    # registration order; shape compatibility restores the correspondence as
    # long as equal-shape parameters appear in the same relative order.
    new_leaves: list = [None] * len(leaves)
    for k, t in main_items:
        placed = False
        for i, leaf in enumerate(leaves):
            if new_leaves[i] is not None:
                continue
            conv = _torch_tensor_to_flax(t, leaf.shape)
            if conv is not None:
                new_leaves[i] = conv.astype(np.float32)
                placed = True
                break
        if not placed:
            raise ValueError(f"Cannot map torch tensor '{k}' {t.shape} onto "
                             "any remaining model parameter")
    new_params = jax.tree.unflatten(treedef, new_leaves)

    new_stats = batch_stats
    if batch_stats and stat_items:
        s_leaves, s_def = jax.tree.flatten(batch_stats)
        if len(stat_items) == len(s_leaves):
            conv_stats = []
            for (k, t), leaf in zip(stat_items, s_leaves):
                if tuple(t.shape) != tuple(leaf.shape):
                    raise ValueError(f"BN stat '{k}' {t.shape} != {leaf.shape}")
                conv_stats.append(t.astype(np.float32))
            new_stats = jax.tree.unflatten(s_def, conv_stats)
    return new_params, new_stats


def load_bmz_model_weights(source: str, params, batch_stats=None, verbose: bool = True):
    """Load weights from a BMZ package onto an already-built model
    (reference: build_bmz_model, models/__init__.py:943). Handles:

    - biapy_tpu exports (msgpack checkpoint attachment): exact param tree.
    - pytorch_state_dict weights: torch -> flax conversion (U-Net family).
    """
    rdf = read_bmz_rdf(source)
    root = rdf["_root"]

    # our own exports: msgpack checkpoint in attachments
    for att in rdf.get("attachments", []) or []:
        src = att.get("source", "")
        if src.endswith(".ckpt"):
            from biapy_tpu.utils.misc import load_checkpoint

            ck = load_checkpoint(os.path.join(root, src))
            if verbose:
                print(f"BMZ import: biapy_tpu checkpoint {src}")
            return ck["params"], ck.get("batch_stats") or batch_stats

    weights = rdf.get("weights", {}) or {}
    if "pytorch_state_dict" in weights:
        import torch

        w = weights["pytorch_state_dict"]
        wsrc = w.get("source", w) if isinstance(w, dict) else w
        sd = torch.load(os.path.join(root, str(wsrc)), map_location="cpu",
                        weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        if verbose:
            print(f"BMZ import: converting pytorch_state_dict ({len(sd)} tensors)")
        return import_torch_state_dict(sd, params, batch_stats)
    raise ValueError(f"BMZ package {source} has no loadable weights "
                     f"(found: {list(weights.keys())})")


def export_model_to_bmz(workflow, output_dir: str, model_name: Optional[str] = None,
                        reuse_original_bmz_config: bool = False) -> str:
    cfg = workflow.cfg
    workflow._ensure_model_for_test()
    os.makedirs(output_dir, exist_ok=True)

    # MODEL.BMZ.EXPORT.REUSE_BMZ_CONFIG: a finetuned BMZ import re-exports
    # under the original package's model card (reference run_job,
    # _biapy.py:1915; validated to require MODEL.SOURCE == 'bmz')
    orig: dict = {}
    if reuse_original_bmz_config:
        orig = read_bmz_rdf(str(cfg.MODEL.BMZ.SOURCE_MODEL_ID))
    name = model_name or orig.get("name") \
        or cfg.MODEL.BMZ.EXPORT.MODEL_NAME or workflow.job_identifier

    # -- test tensors: one real forward pass -------------------------------
    import jax.numpy as jnp

    ps = tuple(cfg.DATA.PATCH_SIZE)
    rng = np.random.default_rng(0)
    test_in = rng.random((1,) + ps, dtype=np.float32)
    test_out = np.asarray(workflow.predict_patches(test_in))
    staging = {}

    def stage(fname: str, writer):
        path = os.path.join(output_dir, fname)
        writer(path)
        staging[fname] = path
        return path

    stage("test_input.npy", lambda p: np.save(p, test_in))
    stage("test_output.npy", lambda p: np.save(p, test_out))

    # -- weights ------------------------------------------------------------
    from biapy_tpu.utils.misc import save_model

    ckpt = save_model(cfg, output_dir, name, workflow.state.params, 0,
                      workflow.state.batch_stats,
                      model_build_kwargs=workflow.model_build_kwargs, metric="bmz")
    staging[os.path.basename(ckpt)] = ckpt

    # -- documentation + cover ------------------------------------------------
    exp = cfg.MODEL.BMZ.EXPORT
    doc_src = str(exp.DOCUMENTATION or "")
    orig_doc = os.path.join(orig["_root"], str(orig.get("documentation") or "")) \
        if orig.get("documentation") else ""
    if doc_src and os.path.exists(doc_src):
        # user-provided markdown (reference: MODEL.BMZ.EXPORT.DOCUMENTATION)
        doc = open(doc_src).read()
    elif orig_doc and os.path.isfile(orig_doc):
        doc = open(orig_doc).read()
    else:
        doc = (f"# {name}\n\nTrained with biapy_tpu {biapy_tpu.__version__} "
               f"({cfg.PROBLEM.TYPE}, {cfg.PROBLEM.NDIM}).\n\n"
               f"Architecture: {cfg.MODEL.ARCHITECTURE}.\n")
    stage("README.md", lambda p: open(p, "w").write(doc))
    cover = (test_out[0, ..., 0] if test_out.ndim == 4 else test_out[0, test_out.shape[1] // 2, ..., 0])
    cover8 = ((cover - cover.min()) / max(cover.max() - cover.min(), 1e-8) * 255).astype(np.uint8)
    from biapy_tpu.data.tiff import write_tiff

    stage("cover.tif", lambda p: write_tiff(p, cover8))

    # -- rdf.yaml -----------------------------------------------------------
    nd = workflow.nd
    axes_in = ([{"type": "batch"}]
               + [{"type": "space", "id": a, "size": ps[i]} for i, a in
                  enumerate(("z", "y", "x")[-nd:])]
               + [{"type": "channel", "channel_names": [f"c{i}" for i in range(ps[-1])]}])
    rdf = {
        "format_version": "0.5.0",
        "type": "model",
        "name": name,
        # user-supplied RDF metadata (reference: MODEL.BMZ.EXPORT.*,
        # export_model_to_bmz _biapy.py:1012); with REUSE_BMZ_CONFIG the
        # imported package's card wins — the reference reuse path passes no
        # bmz_cfg at all (_biapy.py:1915-1916)
        "description": (orig.get("description") if orig else None)
        or exp.DESCRIPTION or f"biapy_tpu {cfg.PROBLEM.TYPE} model",
        "authors": (orig.get("authors") if orig else None)
        or [dict(a) if isinstance(a, dict) else {"name": str(a)}
            for a in exp.AUTHORS] or [{"name": "biapy_tpu"}],
        "license": str((orig.get("license") if orig else None)
                       or exp.LICENSE or "CC-BY-4.0"),
        "tags": (orig.get("tags") if orig else None)
        or [str(t) for t in (exp.TAGS or [])] or [
            str(cfg.PROBLEM.TYPE).lower().replace("_", "-"),
            str(cfg.PROBLEM.NDIM).lower(), str(cfg.MODEL.ARCHITECTURE)],
        "cite": (orig.get("cite") if orig else None)
        or [dict(c) if isinstance(c, dict) else {"text": str(c)}
            for c in (exp.CITE or [])],
        "version": str((orig.get("version") if orig else None)
                       or exp.MODEL_VERSION or "0.1.0"),
        "training_data": (
            {"id": exp.DATASET_INFO[0]["id"]}
            if exp.DATASET_INFO and isinstance(exp.DATASET_INFO[0], dict)
            and exp.DATASET_INFO[0].get("id") else None),
        "documentation": "README.md",
        "covers": ["cover.tif"],
        "inputs": [{"id": "input0", "axes": axes_in,
                    "test_tensor": {"source": "test_input.npy"}}],
        "outputs": [{"id": "output0",
                     "test_tensor": {"source": "test_output.npy"}}],
        "attachments": [{"source": os.path.basename(ckpt),
                         "sha256": _sha256(ckpt),
                         "description": "biapy_tpu msgpack checkpoint (config embedded)"}],
        "config": {"biapy_tpu": {"version": biapy_tpu.__version__,
                                 "workflow": cfg.PROBLEM.TYPE,
                                 "cfg": yaml.safe_load(cfg.dump())}},
    }
    rdf = {k: v for k, v in rdf.items() if v is not None}
    stage("rdf.yaml", lambda p: open(p, "w").write(yaml.safe_dump(rdf, sort_keys=False)))

    # -- zip -------------------------------------------------------------------
    zpath = os.path.join(output_dir, f"{name}.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for fname, path in staging.items():
            z.write(path, fname)
    if workflow.verbose:
        print(f"BMZ package written to {zpath}")
    return zpath
