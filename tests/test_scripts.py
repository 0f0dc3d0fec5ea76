"""Smoke tests for the offline dataset-prep / metric scripts
(`biapy_tpu/utils/scripts/`, reference analog: biapy/utils/scripts/ — 34
one-offs unified here, SURVEY §2.6). Each test drives the real CLI
(`python -m biapy_tpu.utils.scripts.<name>`) on tiny synthetic data and
checks the advertised output — one test per unified flag path."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, *args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", f"biapy_tpu.utils.scripts.{name}",
                        *map(str, args)], capture_output=True, text=True,
                       env=env, timeout=300)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.fixture()
def tiff_dir(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        write_tiff(str(d / f"{i}.tif"),
                   (rng.random((32, 32)) * 255).astype(np.uint8))
    return str(d)


def _read_img(path):
    from biapy_tpu.data.io import imread

    return np.asarray(imread(path))


def test_convert_dataset_roundtrip(tmp_path, tiff_dir):
    # single file tif -> zarr -> h5 -> tif
    src = os.path.join(tiff_dir, "0.tif")
    run_script("convert_dataset", "--input", src,
               "--output", tmp_path / "a.zarr")
    run_script("convert_dataset", "--input", tmp_path / "a.zarr",
               "--output", tmp_path / "a.h5")
    run_script("convert_dataset", "--input", tmp_path / "a.h5",
               "--output", tmp_path / "back.tif")
    orig, back = _read_img(src), _read_img(str(tmp_path / "back.tif"))
    assert np.array_equal(np.squeeze(orig), np.squeeze(back))
    # directory mode with --to
    run_script("convert_dataset", "--input", tiff_dir,
               "--output", tmp_path / "zdir", "--to", ".zarr")
    assert sorted(os.listdir(tmp_path / "zdir")) == ["0.zarr", "1.zarr"]


def test_crop_dataset_with_masks_and_discard(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "x").mkdir(), (tmp_path / "y").mkdir()
    img = np.zeros((64, 64), np.uint8)
    msk = np.zeros((64, 64), np.uint8)
    msk[:32, :32] = 255  # only one quadrant has foreground
    write_tiff(str(tmp_path / "x" / "a.tif"), img + 7)
    write_tiff(str(tmp_path / "y" / "a.tif"), msk)
    run_script("crop_dataset", "--input", tmp_path / "x", "--masks",
               tmp_path / "y", "--output", tmp_path / "out",
               "--patch", 32, 32, "--discard_empty")
    xs = os.listdir(tmp_path / "out" / "x")
    assert len(xs) == 1  # 3 empty-mask crops discarded
    assert len(os.listdir(tmp_path / "out" / "y")) == 1
    # no-mask, keep-all path (crops land directly in --output)
    run_script("crop_dataset", "--input", tmp_path / "x",
               "--output", tmp_path / "out2", "--patch", 32, 32)
    assert len(os.listdir(tmp_path / "out2")) == 4


def test_order_axes(tmp_path):
    from biapy_tpu.data.io import imwrite

    a = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    imwrite(str(tmp_path / "in.h5"), a)
    run_script("order_axes", "--input", tmp_path / "in.h5",
               "--output", tmp_path / "out.h5",
               "--from_order", "ZYX", "--to_order", "XYZ")
    out = _read_img(str(tmp_path / "out.h5"))
    assert out.shape == (4, 3, 2)
    assert np.array_equal(out, a.transpose(2, 1, 0))


def test_remap_labels_map_and_default(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "in").mkdir()
    lab = np.zeros((16, 16), np.uint8)
    lab[:8] = 3
    lab[8:] = 7
    write_tiff(str(tmp_path / "in" / "l.tif"), lab)
    run_script("remap_labels", "--input", tmp_path / "in",
               "--output", tmp_path / "out", "--map", "3:1", "--default", 0)
    out = _read_img(str(tmp_path / "out" / "l.tif")).squeeze()
    assert set(np.unique(out)) == {0, 1}  # 3->1, unmapped 7 -> default 0


def test_fill_holes_in_seg_masks(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "in").mkdir()
    m = np.zeros((24, 24), np.uint8)
    m[4:20, 4:20] = 1
    m[10:14, 10:14] = 0  # hole
    write_tiff(str(tmp_path / "in" / "m.tif"), m)
    run_script("fill_holes_in_seg_masks", "--input", tmp_path / "in",
               "--output", tmp_path / "out")
    out = _read_img(str(tmp_path / "out" / "m.tif")).squeeze()
    assert out[12, 12] > 0  # hole filled


def test_filter_close_points(tmp_path):
    with open(tmp_path / "pts.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["axis-0", "axis-1"])
        for p in [(10, 10), (11, 11), (40, 40)]:  # first two within radius 5
            w.writerow(p)
    out = run_script("filter_close_points", "--input", tmp_path / "pts.csv",
                     "--output", tmp_path / "kept.csv", "--radius", 5,
                     "--resolution", 1, 1)
    assert "3 -> 2 points" in out
    rows = list(csv.DictReader(open(tmp_path / "kept.csv")))
    assert len(rows) == 2


def test_merge_dataset_channels(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    for c in ("c0", "c1"):
        (tmp_path / c).mkdir()
        write_tiff(str(tmp_path / c / "a.tif"),
                   np.full((8, 8), 1 if c == "c0" else 2, np.uint8))
    run_script("merge_dataset_channels", "--inputs", tmp_path / "c0",
               tmp_path / "c1", "--output", tmp_path / "merged")
    out = _read_img(str(tmp_path / "merged" / "a.tif"))
    assert out.shape[-1] == 2 and out[..., 0].max() == 1 and out[..., 1].max() == 2


def test_from_class_csv_to_folders(tmp_path, tiff_dir):
    with open(tmp_path / "cls.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "label"])
        w.writerow(["0.tif", "cat"])
        w.writerow(["1.tif", "dog"])
    run_script("from_class_csv_to_folders", "--input", tiff_dir,
               "--csv", tmp_path / "cls.csv", "--output", tmp_path / "sorted")
    assert os.path.exists(tmp_path / "sorted" / "cat" / "0.tif")
    assert os.path.exists(tmp_path / "sorted" / "dog" / "1.tif")
    assert os.path.exists(os.path.join(tiff_dir, "0.tif"))  # copied, not moved


def test_measure_dataset_size_and_blur(tiff_dir):
    out = run_script("measure_dataset_size", "--input", tiff_dir)
    assert "2" in out  # 2 images
    out = run_script("estimate_blur", "--input", tiff_dir)
    assert "0.tif" in out


def test_instance_stats_and_sizes(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "lab").mkdir()
    lab = np.zeros((32, 32), np.uint16)
    lab[2:10, 2:10] = 1
    lab[20:30, 20:30] = 2
    write_tiff(str(tmp_path / "lab" / "l.tif"), lab)
    out = run_script("instance_stats", "--input", tmp_path / "lab",
                     "--output", tmp_path / "stats.csv")
    rows = list(csv.DictReader(open(tmp_path / "stats.csv")))
    assert len(rows) >= 2
    out = run_script("collect_instance_sizes", "--input", tmp_path / "lab",
                     "--bins", 4)
    assert "2" in out  # 2 instances counted


def test_convert_instance_data_to_detection(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "lab").mkdir()
    lab = np.zeros((32, 32), np.uint16)
    lab[4:10, 4:10] = 1
    write_tiff(str(tmp_path / "lab" / "l.tif"), lab)
    run_script("convert_instance_data_to_detection", "--input",
               tmp_path / "lab", "--output", tmp_path / "det")
    files = os.listdir(tmp_path / "det")
    assert files, "no detection output written"


def test_probability_to_points_and_instances(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "prob").mkdir()
    prob = np.zeros((32, 32), np.float32)
    prob[8, 8] = 1.0
    prob[24, 24] = 1.0
    write_tiff(str(tmp_path / "prob" / "p.tif"), (prob * 255).astype(np.uint8))
    run_script("detection_probs_to_points", "--input", tmp_path / "prob",
               "--output", tmp_path / "pts", "--threshold", 0.5,
               "--min_distance", 3)
    csvs = [f for f in os.listdir(tmp_path / "pts") if f.endswith(".csv")]
    assert csvs
    rows = list(csv.DictReader(open(os.path.join(tmp_path / "pts", csvs[0]))))
    assert len(rows) == 2
    run_script("create_probability_csv", "--input", tmp_path / "prob",
               "--output", tmp_path / "pcsv", "--threshold", 0.5)
    assert any(f.endswith(".csv") for f in os.listdir(tmp_path / "pcsv"))
    run_script("foreground_probs_to_instances", "--input", tmp_path / "prob",
               "--output", tmp_path / "inst", "--threshold", 0.5)
    out = _read_img(str(tmp_path / "inst" / "p.tif")).squeeze()
    assert out.max() >= 2  # two separate instances


def test_measure_class_weights(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    (tmp_path / "m").mkdir()
    m = np.zeros((16, 16), np.uint8)
    m[:4] = 1
    write_tiff(str(tmp_path / "m" / "a.tif"), m)
    out = run_script("measure_class_weights", "--input", tmp_path / "m")
    assert "0" in out and "1" in out


def test_calculate_detection_metrics(tmp_path):
    for name, pts in (("gt", [(5, 5), (20, 20)]), ("pred", [(6, 6), (28, 28)])):
        with open(tmp_path / f"{name}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["axis-0", "axis-1"])
            w.writerows(pts)
    out = run_script("calculate_detection_metrics",
                     "--gt_csv", tmp_path / "gt.csv",
                     "--pred_csv", tmp_path / "pred.csv",
                     "--tolerance", 5, "--resolution", 1, 1)
    assert "F1" in out or "f1" in out


def test_calculate_instance_and_similarity_metrics(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    for d in ("gt", "pred"):
        (tmp_path / d).mkdir()
    lab = np.zeros((32, 32), np.uint16)
    lab[4:12, 4:12] = 1
    write_tiff(str(tmp_path / "gt" / "a.tif"), lab)
    lab2 = np.zeros_like(lab)
    lab2[5:13, 5:13] = 1  # shifted by one: IoU ~ 0.77
    write_tiff(str(tmp_path / "pred" / "a.tif"), lab2)
    out = run_script("calculate_instance_metrics", "--gt_dir", tmp_path / "gt",
                     "--pred_dir", tmp_path / "pred", "--thresholds", 0.5)
    assert "f1" in out.lower()
    out = run_script("calculate_similarity_metrics", "--gt_dir",
                     tmp_path / "gt", "--pred_dir", tmp_path / "pred")
    assert "psnr" in out.lower()


def test_lightmycell_data_preparation(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    study = tmp_path / "in" / "Study_1"
    study.mkdir(parents=True)
    img = np.zeros((16, 16), np.uint8)
    # acquisition prefix "Study_1_BF_img1": BF transmitted-light source +
    # Actin fluorescence target share the prefix
    write_tiff(str(study / "Study_1_BF_img1_Actin.tif"), img + 9)
    write_tiff(str(study / "Study_1_BF_img1_x.tif"), img + 3)
    run_script("lightmycell_data_preparation", "--input", tmp_path / "in",
               "--output", tmp_path / "out", "--organelle", "Actin")
    root = tmp_path / "out" / "Actin"
    assert (root / "y").is_dir() and (root / "x").is_dir()
    assert any((root / "y").rglob("*.tif"))
    assert any((root / "x").rglob("*.tif"))


def test_change_dataset_id_bmz_models(tmp_path):
    import yaml
    import zipfile

    (tmp_path / "in").mkdir()
    with zipfile.ZipFile(tmp_path / "in" / "model_mito.zip", "w") as z:
        z.writestr("rdf.yaml", yaml.safe_dump({"name": "m", "type": "model"}))
        z.writestr("weights.pt", b"xx")
    with zipfile.ZipFile(tmp_path / "in" / "other.zip", "w") as z:
        z.writestr("rdf.yaml", yaml.safe_dump({"name": "o"}))
    run_script("change_dataset_id_bmz_models", "--input_dir", tmp_path / "in",
               "--output_dir", tmp_path / "out", "--matching_str", "mito",
               "--id_to_set", "sublime-pizza")
    outs = os.listdir(tmp_path / "out")
    assert outs == ["model_mito.zip"]  # only the matching zip rewritten
    with zipfile.ZipFile(tmp_path / "out" / "model_mito.zip") as z:
        rdf = yaml.safe_load(z.read("rdf.yaml"))
        assert rdf["training_data"] == {"id": "sublime-pizza"}
        assert z.read("weights.pt") == b"xx"  # other members preserved


def test_detection_plots_and_pr_plot(tmp_path):
    from biapy_tpu.data.tiff import write_tiff

    prob = np.zeros((32, 32), np.float32)
    prob[10, 10] = 0.9
    write_tiff(str(tmp_path / "p.tif"), (prob * 255).astype(np.uint8))
    with open(tmp_path / "gt.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["axis-0", "axis-1"])
        w.writerow([10, 10])
    run_script("detection_plots", "--pred", tmp_path / "p.tif",
               "--gt_csv", tmp_path / "gt.csv", "--tolerance", 3,
               "--output", tmp_path)
    assert any(f.endswith((".svg", ".png")) for f in os.listdir(tmp_path))

    (tmp_path / "gtl").mkdir()
    lab = np.zeros((32, 32), np.uint16)
    lab[4:12, 4:12] = 1
    write_tiff(str(tmp_path / "gtl" / "a.tif"), lab)
    for th in ("0.5",):
        d = tmp_path / "preds" / f"th_{th}"  # per-threshold subdir naming
        os.makedirs(d)
        write_tiff(str(d / "a.tif"), lab)
    run_script("pr_plot_instances", "--gt", tmp_path / "gtl",
               "--preds", tmp_path / "preds", "--thresholds", 0.5,
               "--out", tmp_path / "pr.svg")
    assert os.path.exists(tmp_path / "pr.svg")


def test_threshold_plots(tmp_path):
    """IoU-vs-threshold sweep chart (reference util.py:108)."""
    import numpy as np

    from biapy_tpu.utils.util import threshold_plots

    rng = np.random.default_rng(0)
    gt = (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32)
    preds = gt * 0.8 + rng.random((4, 32, 32, 1)) * 0.2
    iou = threshold_plots(preds, gt, "job_1", str(tmp_path), r_val=0.5)
    assert 0.0 <= iou <= 1.0
    import glob
    assert glob.glob(str(tmp_path) + "/t_job_1/*.png")
