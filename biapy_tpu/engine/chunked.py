"""By-chunks inference engine: terabyte-scale volumes, tile by tile.

Reference analog: the chunked path across base_workflow.py:2469-2743,
chunked_test_pair_data_generator.py (rank_workload:403, shared-Zarr writes
:753-833), chunked_tiles.py (ChunkedTileProcessor:15) and the 5-pass
distributed instance merge (instance_seg.py:1915-2290).

TPU-native design (SURVEY.md §5.7): the volume streams host->HBM one tile
(+halo) at a time; each tile runs the on-device sliding-window stitch
(biapy_tpu/ops/stitch.py — one compiled program per tile shape), and the
blended tile core is written into a shared output Zarr. Tiles are sharded
across processes round-robin; every process owns disjoint output regions so
concurrent Zarr writes never collide (same invariant the reference relies
on). The instance merge runs host-side:
  A. per-tile instance creation (watershed) with halo context,
  B. disjoint relabel via per-tile offsets (allgather of per-tile max ids),
  C. boundary-face IoU edge extraction between adjacent tiles,
  D. union-find on the edges (C++ op) -> canonical remap, broadcast,
  E. rewrite every owned tile with canonical ids.

Restartability: phases can run as separate jobs
(TEST.BY_CHUNKS.PHASES / Z_START / Z_END, reference config.py:1918-1941) —
the raw-prediction Zarr is the checkpoint between them.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from biapy_tpu.data.io import open_lazy
from biapy_tpu.data.zarr_store import ZarrArray
from biapy_tpu.parallel import all_gather_objects, barrier, is_main_process


def dequant_pred(a) -> np.ndarray:
    """Undo the quantized uint8 raw-prediction storage
    (TEST.OUTPUT_QUANT_UINT8): uint8 reads back as value/255 float32;
    anything else passes through as float32."""
    a = np.asarray(a)
    if a.dtype == np.uint8:
        return a.astype(np.float32) / 255.0
    return a.astype(np.float32, copy=False)


@dataclass(frozen=True)
class Tile:
    index: Tuple[int, ...]           # tile grid coords
    core_start: Tuple[int, ...]      # in volume coords
    core_end: Tuple[int, ...]
    halo_start: Tuple[int, ...]      # core +/- halo, clamped
    halo_end: Tuple[int, ...]


def tile_grid(vol_shape: Sequence[int], tile_size: Sequence[int], halo: Sequence[int]) -> List[Tile]:
    """Split a volume into core tiles with clamped halos (reference:
    chunked_tile_grid, data_3D_manipulation.py:1156)."""
    nd = len(vol_shape)
    counts = [max(1, math.ceil(vol_shape[d] / tile_size[d])) for d in range(nd)]
    tiles = []
    for flat in range(int(np.prod(counts))):
        idx = []
        rem = flat
        for c in reversed(counts):
            idx.append(rem % c)
            rem //= c
        idx = tuple(reversed(idx))
        cs = tuple(idx[d] * tile_size[d] for d in range(nd))
        ce = tuple(min(vol_shape[d], cs[d] + tile_size[d]) for d in range(nd))
        hs = tuple(max(0, cs[d] - halo[d]) for d in range(nd))
        he = tuple(min(vol_shape[d], ce[d] + halo[d]) for d in range(nd))
        tiles.append(Tile(idx, cs, ce, hs, he))
    return tiles


def owned_tiles(ci: "ChunkedInference", spatial: Sequence[int]):
    """Tile grid over ``spatial`` plus this rank's round-robin share
    (shared by the detection/synapse per-tile point extractors); ownership
    delegates to the same predicate the predictor uses so the extractors can
    never disagree with the written tiles."""
    tiles = tile_grid(tuple(spatial), ci.tile_size, ci.halo)
    return tiles, [(i, t) for i, t in enumerate(tiles) if ci.owns(i)]


def core_keep_mask(coords: np.ndarray, tile: Tile, nd: int) -> np.ndarray:
    """Boolean mask of local-coordinate points whose global position falls in
    the tile CORE — halo context sharpens extraction near edges while core
    ownership keeps per-tile point sets disjoint (no double counting)."""
    keep = np.ones(len(coords), bool)
    for d in range(nd):
        g = coords[:, d] + tile.halo_start[d]
        keep &= (g >= tile.core_start[d]) & (g < tile.core_end[d])
    return keep


class ChunkedInference:
    """Runs sliding-window inference over a huge volume, tile by tile."""

    def __init__(
        self,
        workflow,
        patch_size: Sequence[int],
        overlap: Sequence[float],
        padding: Sequence[int],
        patches_per_tile: Sequence[int],
        out_channels: int,
        out_dir: str,
        rank: int = 0,
        world: int = 1,
    ):
        self.wf = workflow
        self.nd = len(patch_size)
        self.patch = tuple(patch_size)
        self.overlap = tuple(overlap)
        self.padding = tuple(padding)
        core = tuple(self.patch[d] - 2 * self.padding[d] for d in range(self.nd))
        ppt = list(patches_per_tile) + [1] * (self.nd - len(patches_per_tile))
        self.tile_size = tuple(core[d] * max(1, int(ppt[d])) for d in range(self.nd))
        self.halo = tuple(self.padding)
        self.out_channels = out_channels
        self.out_dir = out_dir
        self.rank = rank
        self.world = world

    def owns(self, tile_index: int) -> bool:
        """Round-robin tile ownership predicate (reference: rank_workload)."""
        return tile_index % self.world == self.rank

    def my_tiles(self, tiles: List[Tile]) -> List[Tile]:
        """This rank's round-robin share of the tile grid."""
        return [t for i, t in enumerate(tiles) if self.owns(i)]

    # -- phase 1: raw prediction ---------------------------------------------
    def predict_volume(self, vol_path: str, out_name: str = "raw_pred.zarr",
                       z_range: Tuple[int, int] = (-1, -1),
                       verbose: bool = True, data_path: Optional[str] = None,
                       roi=None, axes_order: Optional[str] = None,
                       axes_order_is_default: bool = False) -> str:
        """``roi``: optional lazy array of the volume's spatial shape; tiles
        whose core has no ROI voxel are skipped entirely (reference:
        config.py:934 — by-chunks does not predict patches outside the ROI)
        and partially-covered cores are masked. ``axes_order``: on-disk axes
        of the input (DATA.TEST.INPUT_IMG_AXES_ORDER); slices are translated
        lazily, the volume is never materialised. When the caller flags the
        order as the untouched config default ('TZCYX') and the data has an
        unmistakable channels-last signature (nd+1 dims, last axis <= 4),
        the channels-last heuristic wins — otherwise a plain ZYXC zarr would
        silently be read as Z,C,Y,X."""
        vol, handle = open_lazy(vol_path, data_path=data_path)
        channels_last_signature = (len(vol.shape) == self.nd + 1
                                   and int(vol.shape[-1]) <= 4)
        if (axes_order and len(vol.shape) >= self.nd
                and not (axes_order_is_default and channels_last_signature)):
            from biapy_tpu.data.io import LazyCanonicalView

            vol = LazyCanonicalView(vol, is_3d=self.nd == 3, axes_order=axes_order)
        shape = tuple(vol.shape)
        has_c = len(shape) == self.nd + 1
        spatial = shape[: self.nd]
        if z_range[0] >= 0 or z_range[1] >= 0:
            z0 = max(0, z_range[0]) if z_range[0] >= 0 else 0
            z1 = z_range[1] if z_range[1] >= 0 else spatial[0]
        else:
            z0, z1 = 0, spatial[0]

        # Z-range sub-jobs partition the tile grid by core START: a tile
        # belongs to the job whose [Z_START, Z_END) contains its core_start,
        # so ranges that tile the volume give disjoint, complete coverage
        # (a tile crossing Z_END is finished by the job that started it).
        tiles = tile_grid(spatial, self.tile_size, self.halo)
        tiles = [t for t in tiles if z0 <= t.core_start[0] < z1]
        mine = self.my_tiles(tiles)

        # Quantized raw-prediction storage (TEST.OUTPUT_QUANT_UINT8): the
        # drain ships round(p*255) uint8 — 1/4 the D2H bytes and Zarr size
        # of f32 — and every downstream reader dequantizes via dequant_pred
        # (error <= 1/510 on probability maps; config validation restricts
        # the flag to probability-only channel sets).
        quant = bool(getattr(getattr(getattr(self.wf, "cfg", None), "TEST", None),
                             "OUTPUT_QUANT_UINT8", False))
        out_path = os.path.join(self.out_dir, out_name)
        os.makedirs(self.out_dir, exist_ok=True)
        out = ZarrArray.create(
            out_path, shape=spatial + (self.out_channels,),
            chunks=self.tile_size + (self.out_channels,),
            dtype="u1" if quant else "f4",
            compressor={"id": "zlib", "level": 1},
        )
        if verbose and is_main_process():
            print(f"[by-chunks] volume {spatial} -> {len(tiles)} tiles "
                  f"({self.tile_size}), {len(mine)} owned by rank {self.rank}")

        # Tiles round-robin across local chips with async dispatch: while
        # chip k computes tile i, the host reads tile i+1 from Zarr and chip
        # k+1 computes it — compute, H2D/D2H and disk IO all overlap. The
        # host path (TTA) degrades to synchronous single-device.
        # The D2H drain is MULTI-STREAM: each tile's program emits z-chunked
        # output buffers (out_splits) and a thread pool pulls them
        # concurrently — measured on the tunnel transport, one stream moves
        # ~2 MB/s while 16-32 concurrent pulls reach ~25-79 MB/s aggregate
        # (BASELINE.md); on local PCIe the pool is harmless. Tile Zarr
        # writes land on disjoint, tile-aligned chunks, so drains of
        # different tiles can also overlap.
        import threading as _threading
        from concurrent.futures import ThreadPoolExecutor

        import jax as _jax

        devices = _jax.local_devices()
        inflight: List[tuple] = []
        n_streams = max(1, int(os.environ.get("BIAPY_TPU_D2H_STREAMS", "64")))
        pull_pool = ThreadPoolExecutor(max_workers=n_streams)
        drain_pool = ThreadPoolExecutor(max_workers=2)
        drain_futures: List = []
        drain_lock = _threading.Lock()
        drain_stats = {"bytes": 0, "t0": None, "t1": None}

        def _z_splits(extent: int):
            b = np.linspace(0, extent, n_streams + 1).astype(int)
            return [(int(b[i]), int(b[i + 1])) for i in range(n_streams)
                    if b[i] < b[i + 1]]

        def drain(entry):
            t, pred, roi_core = entry
            if isinstance(pred, (list, tuple)):  # chunked device buffers
                splits, chunks = pred
                z_extent = splits[-1][1]
                first = None

                def _pull(args):
                    (z0c, z1c), chunk = args
                    ts = time.time()
                    arr = np.asarray(_jax.device_get(chunk))
                    te = time.time()
                    with drain_lock:
                        drain_stats["bytes"] += arr.nbytes
                        if drain_stats["t0"] is None or ts < drain_stats["t0"]:
                            drain_stats["t0"] = ts
                        if drain_stats["t1"] is None or te > drain_stats["t1"]:
                            drain_stats["t1"] = te
                    return (z0c, arr)

                parts = dict()
                for z0c, arr in pull_pool.map(_pull, zip(splits, chunks)):
                    parts[z0c] = arr
                first = parts[splits[0][0]]
                pred = np.empty((z_extent,) + first.shape[1:], first.dtype)
                for (z0c, z1c) in splits:
                    pred[z0c:z1c] = parts[z0c]
            else:
                pred = np.asarray(pred)
            if not quant:
                pred = pred.astype(np.float32)
            elif pred.dtype != np.uint8:
                # host (TTA) fallback emits floats; quantize them the same
                # way the device program does — a bare u1 Zarr write would
                # TRUNCATE [0,1] floats to 0/1
                pred = np.round(np.clip(pred.astype(np.float32), 0.0, 1.0)
                                * 255.0).astype(np.uint8)
            core_shape = tuple(t.core_end[d] - t.core_start[d]
                               for d in range(self.nd))
            if pred.shape[: self.nd] != core_shape:
                # host (TTA) fallback returns the full padded-block extent;
                # the device path's pre_padded output IS the core already
                pred = pred[tuple(slice(self.halo[d],
                                        self.halo[d] + core_shape[d])
                                  for d in range(self.nd))]
            core_sl_out = tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))
            core = pred
            if roi_core is not None:
                core = (core * roi_core[..., None]).astype(core.dtype)
            out[core_sl_out + (slice(None),)] = core

        if roi is not None and tuple(roi.shape[: self.nd]) != tuple(spatial):
            raise ValueError(
                f"ROI mask spatial shape {tuple(roi.shape[: self.nd])} does not "
                f"match the volume {tuple(spatial)} — by-chunks needs a "
                "full-resolution mask (the per-image path rescales, this one "
                "streams)")
        skipped = 0
        dispatched = 0  # device round-robin keys on DISPATCHED tiles only —
        # indexing by loop position would starve chips when ROI skips are
        # periodic (e.g. every other tile empty -> all work on device 0)
        try:
            for ti, t in enumerate(mine):
                roi_core = None
                if roi is not None:
                    core_sl = tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))
                    roi_core = np.asarray(roi[core_sl])
                    while roi_core.ndim > self.nd:  # drop trailing channel axes
                        roi_core = roi_core[..., 0]
                    roi_core = roi_core > 0
                    if not roi_core.any():
                        skipped += 1
                        continue
                    if roi_core.all():
                        roi_core = None
                region = tuple(slice(t.halo_start[d], t.halo_end[d]) for d in range(self.nd))
                block = np.asarray(vol[region])
                if not has_c:
                    block = block[..., None]
                # Uniform pre-padded blocks: every tile ships as
                # core + 2*halo (volume-edge tiles reflect-padded on the
                # host, interior tiles use the real halo), so (a) ALL
                # interior tiles share ONE compiled program instead of up to
                # 8 edge-shape variants, and (b) the patch grid covers only
                # the CORE rows — the un-padded path's grid also walked the
                # halo band (27 patches instead of 8 per (2,2,2) tile at the
                # reference geometry, config.py:1974), a ~3.4x compute waste
                # whose outputs the drain then threw away.
                pw = [(self.halo[d] - (t.core_start[d] - t.halo_start[d]),
                       self.halo[d] - (t.halo_end[d] - t.core_end[d]))
                      for d in range(self.nd)] + [(0, 0)]
                if any(p != (0, 0) for p in pw):
                    block = np.pad(block, pw, mode="reflect")
                from biapy_tpu.data.norm import compute_norm_stats, normalize_image

                # Normalization runs ON DEVICE: the host computes the
                # per-tile stats from the raw bytes (one narrow-dtype read)
                # and ships the block in its storage dtype — uint8 EM data
                # travels at 1 byte/voxel, a quarter of the old
                # host-normalized float32 (reference normalizes per patch on
                # host, chunked_test_pair_data_generator.py:524).
                spec = getattr(self.wf, "test_norm_spec", self.wf.norm_spec)
                stats = compute_norm_stats(block, spec)
                sp = _z_splits(int(t.core_end[0] - t.core_start[0]))
                dev_pred = self.wf.predict_block_on_device(
                    block, overlap=self.overlap, padding=self.padding,
                    device=devices[dispatched % len(devices)], sync=False,
                    out_splits=sp, norm_stats=stats,
                    pre_padded=(True,) * self.nd)
                dispatched += 1
                if dev_pred is None:
                    # host (TTA) fallback: same stats -> identical values
                    block_n, _ = normalize_image(
                        block.astype(np.float32), spec, stats=stats)
                    drain((t, self._predict_block(block_n), roi_core))
                else:
                    inflight.append((t, (sp, dev_pred), roi_core))
                    if len(inflight) >= max(2, len(devices)):
                        drain_futures.append(
                            drain_pool.submit(drain, inflight.pop(0)))
                if verbose:
                    print(f"[by-chunks] rank {self.rank}: tile {ti + 1}/{len(mine)} dispatched")
            if skipped and verbose:
                print(f"[by-chunks] rank {self.rank}: {skipped} tiles outside the ROI skipped")
            for entry in inflight:
                drain_futures.append(drain_pool.submit(drain, entry))
            for fu in drain_futures:
                fu.result()  # re-raises drain/pull errors (e.g. async OOM)
        finally:
            pull_pool.shutdown(wait=True)
            drain_pool.shutdown(wait=True)
            if handle is not None:
                handle.close()
        dt = ((drain_stats["t1"] - drain_stats["t0"])
              if drain_stats["t0"] is not None else None)
        self.last_drain_stats = {
            "bytes": drain_stats["bytes"], "seconds": dt, "streams": n_streams,
            "mb_per_s": (drain_stats["bytes"] / 1e6 / dt) if dt else None,
        }
        barrier("chunked_raw_pred")
        return out_path

    def _predict_block(self, block: np.ndarray) -> np.ndarray:
        """Sliding-window inference over one (halo-extended) tile. Prefers
        the single-program on-device stitch (block -> HBM once, lax.scan over
        the patch grid, spline scatter-add; biapy_tpu/ops/stitch.py); falls
        back to the host crop/merge path when TTA is enabled."""
        dev = self.wf.predict_block_on_device(block, overlap=self.overlap,
                                              padding=self.padding)
        if dev is not None:
            return dev
        from biapy_tpu.data.patching import crop_data_with_overlap, merge_data_with_overlap

        # ensure the block fits at least one patch
        from biapy_tpu.data.patching import pad_to_min_shape

        block_p, pads = pad_to_min_shape(block, self.patch)
        patches, _ = crop_data_with_overlap(block_p[None], self.patch + (block.shape[-1],),
                                            overlap=self.overlap, padding=self.padding)
        preds = self.wf.predict_patches(patches)
        merged = merge_data_with_overlap(
            preds, (1,) + block_p.shape[: self.nd] + (self.out_channels,),
            overlap=self.overlap, padding=self.padding,
        )[0]
        unpad = tuple(slice(p[0], merged.shape[d] - p[1]) for d, p in enumerate(pads))
        return merged[unpad]

    # -- phase 2+3: per-tile instances + cross-tile merge ----------------------
    def create_and_merge_instances(
        self,
        raw_pred_path: str,
        instance_fn: Callable[[np.ndarray], np.ndarray],
        merge_iou_th: float = 0.3,
        out_name: str = "instances.zarr",
        min_instance_size: int = 0,
        verbose: bool = True,
    ) -> str:
        """Pass A-E of the distributed instance merge (reference:
        instance_seg.py:1915-2290)."""
        pred = ZarrArray(raw_pred_path)
        spatial = tuple(pred.shape[: self.nd])
        tiles = tile_grid(spatial, self.tile_size, self.halo)
        mine = self.my_tiles(tiles)
        out_path = os.path.join(self.out_dir, out_name)
        out = ZarrArray.create(out_path, shape=spatial, chunks=self.tile_size,
                               dtype="i4", compressor={"id": "zlib", "level": 1})

        # Pass A: per-tile instances (with halo context), core written out.
        local_max: Dict[Tuple[int, ...], int] = {}
        for t in mine:
            region = tuple(slice(t.halo_start[d], t.halo_end[d]) for d in range(self.nd))
            p = dequant_pred(pred[region + (slice(None),)])
            labels = instance_fn(p)
            core_local = tuple(slice(t.core_start[d] - t.halo_start[d],
                                     t.core_end[d] - t.halo_start[d]) for d in range(self.nd))
            core = labels[core_local]
            local_max[t.index] = int(core.max())
            out[tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))] = core
        barrier("chunked_pass_a")

        # Pass B: allgather per-tile max ids -> prefix offsets -> disjoint relabel.
        gathered = all_gather_objects(local_max)
        tile_max: Dict[Tuple[int, ...], int] = {}
        for g in gathered:
            tile_max.update(g)
        order = sorted(tile_max.keys())
        offsets: Dict[Tuple[int, ...], int] = {}
        acc = 0
        for k in order:
            offsets[k] = acc
            acc += tile_max[k]
        total_ids = acc
        for t in mine:
            if tile_max.get(t.index, 0) == 0:
                continue
            sl = tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))
            lab = out[sl]
            lab[lab > 0] += offsets[t.index]
            out[sl] = lab
        barrier("chunked_pass_b")

        # Pass C: boundary-face edges between adjacent tiles (IoU over the
        # touching faces).
        edges: List[Tuple[int, int]] = []
        index_map = {t.index: t for t in tiles}
        for t in mine:
            for d in range(self.nd):
                nb_idx = list(t.index)
                nb_idx[d] += 1
                nb = index_map.get(tuple(nb_idx))
                if nb is None:
                    continue
                face_a_sl = []
                face_b_sl = []
                for dd in range(self.nd):
                    if dd == d:
                        face_a_sl.append(slice(t.core_end[d] - 1, t.core_end[d]))
                        face_b_sl.append(slice(nb.core_start[d], nb.core_start[d] + 1))
                    else:
                        lo = max(t.core_start[dd], nb.core_start[dd])
                        hi = min(t.core_end[dd], nb.core_end[dd])
                        face_a_sl.append(slice(lo, hi))
                        face_b_sl.append(slice(lo, hi))
                a = out[tuple(face_a_sl)].reshape(-1)
                b = out[tuple(face_b_sl)].reshape(-1)
                both = (a > 0) & (b > 0)
                if not both.any():
                    continue
                pairs, counts = np.unique(np.stack([a[both], b[both]]), axis=1, return_counts=True)
                # per-label face areas in one counting pass (a per-pair
                # count_nonzero rescan is O(pairs * face))
                ua, ca = np.unique(a[a > 0], return_counts=True)
                ub, cb = np.unique(b[b > 0], return_counts=True)
                area_a = dict(zip(ua.tolist(), ca.tolist()))
                area_b = dict(zip(ub.tolist(), cb.tolist()))
                for (ia, ib), c in zip(pairs.T, counts):
                    iou = c / max(area_a[int(ia)] + area_b[int(ib)] - c, 1)
                    if iou >= merge_iou_th:
                        edges.append((int(ia), int(ib)))
        barrier("chunked_pass_c")

        # Pass D: gather edges, union-find (C++), broadcast canonical remap.
        all_edges: List[Tuple[int, int]] = []
        for g in all_gather_objects(edges):
            all_edges.extend(g)
        from biapy_tpu.native import union_find_merge

        if all_edges and total_ids > 0:
            remap = union_find_merge(np.asarray(all_edges, np.int32), total_ids)
        else:
            remap = np.arange(total_ids + 1, dtype=np.int32)
        # compact ids
        used = np.unique(remap)
        used = used[used > 0]
        compact = np.zeros(total_ids + 1, np.int32)
        compact[used] = np.arange(1, len(used) + 1, dtype=np.int32)
        remap = compact[remap]

        # Pass E: rewrite owned tiles with canonical ids, accumulating global
        # per-id voxel counts for the post-merge size filter (instances are
        # filtered AFTER merging — a fragment split across tiles must not be
        # dropped for its per-tile size).
        n_final = len(used)
        local_sizes = np.zeros(n_final + 1, np.int64)
        for t in mine:
            sl = tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))
            lab = remap[out[sl]]
            out[sl] = lab
            local_sizes += np.bincount(lab.reshape(-1), minlength=n_final + 1)
        barrier("chunked_pass_e")

        if min_instance_size > 0:
            sizes = np.sum(all_gather_objects(local_sizes), axis=0)
            keep = sizes >= min_instance_size
            keep[0] = False
            final_map = np.zeros(n_final + 1, np.int32)
            final_map[keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.int32)
            for t in mine:
                sl = tuple(slice(t.core_start[d], t.core_end[d]) for d in range(self.nd))
                out[sl] = final_map[out[sl]]
            n_final = int(keep.sum())
            barrier("chunked_size_filter")

        if verbose and is_main_process():
            print(f"[by-chunks] merged instances: {total_ids} tile-local ids -> {n_final} final")
        return out_path
