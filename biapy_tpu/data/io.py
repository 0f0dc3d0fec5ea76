"""Unified image IO: TIFF / HDF5 / Zarr / NPY / PNG-JPG.

Reference analog: ``read_img_as_ndarray`` / ``imread`` / ``imwrite`` /
``save_tif`` (reference: biapy/data/data_manipulation.py:3417-3900).
Convention preserved from the reference: images are channels-last ndarrays —
``(y, x, c)`` in 2D, ``(z, y, x, c)`` in 3D.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple, Union

import numpy as np

from biapy_tpu.data.tiff import read_tiff, write_tiff
from biapy_tpu.data.zarr_store import ZarrArray, ZarrGroup, open_zarr

TIFF_EXTS = (".tif", ".tiff")
H5_EXTS = (".h5", ".hdf5", ".hdf")
ZARR_EXTS = (".zarr", ".n5")
PNG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")
NPY_EXTS = (".npy",)

SUPPORTED_EXTS = TIFF_EXTS + H5_EXTS + ZARR_EXTS + PNG_EXTS + NPY_EXTS


def _first_h5_dataset(h5file, data_path: Optional[str] = None):
    import h5py

    if data_path:
        return h5file[data_path]
    found = []

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset) and not found:
            found.append(obj)

    h5file.visititems(visit)
    if not found:
        raise ValueError(f"No dataset found in HDF5 file {h5file.filename}")
    return found[0]


def _first_zarr_array(z: Union[ZarrArray, ZarrGroup], data_path: Optional[str] = None) -> ZarrArray:
    if isinstance(z, ZarrArray):
        return z
    if data_path:
        arr = z[data_path]
        if isinstance(arr, ZarrArray):
            return arr
        raise ValueError(f"{data_path} is a group, not an array")
    for name in z.keys():
        sub = z[name]
        if isinstance(sub, ZarrArray):
            return sub
        if isinstance(sub, ZarrGroup):
            try:
                return _first_zarr_array(sub)
            except ValueError:
                continue
    raise ValueError(f"No array found in zarr group {z.path}")


def imread(path: str, data_path: Optional[str] = None) -> np.ndarray:
    """Read an image file into an ndarray (no axis normalization applied)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in TIFF_EXTS:
        return read_tiff(path)
    if ext in H5_EXTS:
        import h5py

        with h5py.File(path, "r") as f:
            return _first_h5_dataset(f, data_path)[...]
    if ext in ZARR_EXTS or os.path.isdir(path) and os.path.exists(os.path.join(path, ".zarray")):
        return np.asarray(_first_zarr_array(open_zarr(path), data_path))
    if ext in NPY_EXTS:
        return np.load(path)
    if ext in PNG_EXTS:
        import imageio.v2 as iio

        return np.asarray(iio.imread(path))
    raise ValueError(f"Unsupported image extension: {path}")


def open_lazy(path: str, data_path: Optional[str] = None):
    """Open a chunked file (zarr/h5) without reading it; returns an
    array-like supporting slicing, plus a file handle to close (or None).

    Reference analog: ``load_img_part_from_efficient_file`` and the lazy
    handles used throughout biapy/data/data_3D_manipulation.py.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext in H5_EXTS:
        import h5py

        f = h5py.File(path, "r")
        return _first_h5_dataset(f, data_path), f
    if ext in ZARR_EXTS or (os.path.isdir(path) and os.path.exists(os.path.join(path, ".zarray"))):
        return _first_zarr_array(open_zarr(path), data_path), None
    # Non-chunked formats: read fully.
    return imread(path, data_path), None


def imwrite(path: str, data: np.ndarray, data_path: Optional[str] = None) -> None:
    """Write an ndarray to ``path``, dispatching on extension."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext in TIFF_EXTS:
        write_tiff(path, data)
        return
    if ext in H5_EXTS:
        import h5py

        with h5py.File(path, "w") as f:
            f.create_dataset(data_path or "data", data=data, compression="gzip")
        return
    if ext in ZARR_EXTS:
        arr = ZarrArray.create(
            path,
            shape=data.shape,
            chunks=tuple(min(s, 256) for s in data.shape),
            dtype=data.dtype,
            compressor={"id": "zlib", "level": 1},
            overwrite=True,
        )
        arr[tuple(slice(None) for _ in data.shape)] = data
        return
    if ext in NPY_EXTS:
        np.save(path, data)
        return
    if ext in PNG_EXTS:
        import imageio.v2 as iio

        iio.imwrite(path, data)
        return
    raise ValueError(f"Unsupported image extension: {path}")


def ensure_channels_last(img: np.ndarray, ndim: int, axes_order: Optional[str] = None) -> np.ndarray:
    """Normalize an image to the channels-last convention.

    ``ndim`` is the problem dimensionality (2 or 3); output is ``(y, x, c)``
    or ``(z, y, x, c)``. ``axes_order`` (e.g. "ZCYX", "TZCYX") overrides the
    heuristic, matching ``DATA.*.INPUT_IMG_AXES_ORDER`` semantics.
    """
    img = np.asarray(img)
    if axes_order:
        axes_order = axes_order.upper()
        if len(axes_order) != img.ndim:
            raise ValueError(f"axes_order '{axes_order}' does not match image ndim {img.ndim}")
        # Drop any singleton T axis.
        if "T" in axes_order:
            t = axes_order.index("T")
            if img.shape[t] != 1:
                raise ValueError("Time axis with size > 1 not supported")
            img = np.take(img, 0, axis=t)
            axes_order = axes_order.replace("T", "")
        want = "ZYXC" if ndim == 3 else "YXC"
        if "C" not in axes_order:
            img = img[..., None]
            axes_order += "C"
        if set(axes_order) != set(want):
            raise ValueError(f"axes_order '{axes_order}' incompatible with {want}")
        img = np.transpose(img, [axes_order.index(a) for a in want])
        return img

    if ndim == 2:
        if img.ndim == 2:
            return img[..., None]
        if img.ndim == 3:
            # channels-first (c small, leading) -> move to last
            if img.shape[0] <= 4 and img.shape[-1] > 4:
                return np.moveaxis(img, 0, -1)
            return img
        raise ValueError(f"Cannot interpret shape {img.shape} as a 2D image")
    else:
        if img.ndim == 3:
            return img[..., None]
        if img.ndim == 4:
            if img.shape[0] <= 4 and img.shape[-1] > 4:
                return np.moveaxis(img, 0, -1)
            return img
        raise ValueError(f"Cannot interpret shape {img.shape} as a 3D volume")


def read_img_as_ndarray(path: str, is_3d: bool = False, data_path: Optional[str] = None) -> np.ndarray:
    """Read an image and normalize to channels-last (reference:
    data_manipulation.py:3417)."""
    return ensure_channels_last(imread(path, data_path), 3 if is_3d else 2)


def list_image_files(directory: str) -> List[str]:
    """Sorted list of readable image files (or zarr dirs) in a directory."""
    out = []
    for name in sorted(os.listdir(directory)):
        p = os.path.join(directory, name)
        ext = os.path.splitext(name)[1].lower()
        if ext in SUPPORTED_EXTS:
            out.append(p)
        elif os.path.isdir(p) and (
            os.path.exists(os.path.join(p, ".zarray")) or os.path.exists(os.path.join(p, ".zgroup"))
        ):
            out.append(p)
    return out


def save_tif(
    data: np.ndarray,
    out_dir: str,
    filenames: Optional[List[str]] = None,
    verbose: bool = True,
) -> None:
    """Save a batch of images as TIFFs (reference: data_manipulation.py:3821).

    ``data`` is (n, y, x, c) or (n, z, y, x, c).
    """
    os.makedirs(out_dir, exist_ok=True)
    if verbose:
        print(f"Saving {len(data)} images in {out_dir} . . .")
    for i in range(len(data)):
        if filenames is not None:
            base = os.path.splitext(os.path.basename(filenames[i]))[0] + ".tif"
        else:
            base = f"{i:03d}.tif"
        write_tiff(os.path.join(out_dir, base), data[i])
