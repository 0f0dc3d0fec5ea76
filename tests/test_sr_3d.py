"""3D RCAN / DFCAN (reference: the 3D availability list,
check_configuration.py:2531 includes rcan and dfcan; edsr/wdsr stay 2D)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_rcan_dfcan_3d_forward():
    from biapy_tpu.models.sr_models import DFCAN, RCAN

    x = jnp.zeros((1, 8, 16, 16, 1))
    m = RCAN(ndim=3, scale=2, filters=8, num_rg=1, num_rcab=1, reduction=4)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 16, 32, 32, 1)
    m = DFCAN(ndim=3, scale=2, n_resgroup=1, n_rcab=1)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 16, 32, 32, 1)


def test_sr_3d_arch_validation():
    """rcan/dfcan accepted in 3D; edsr/wdsr rejected (reference parity)."""
    from biapy_tpu.config.config import get_cfg_defaults
    from biapy_tpu.engine.check_configuration import check_configuration

    from biapy_tpu.config.config import update_dependencies

    def cfg_with(arch):
        cfg = get_cfg_defaults()
        cfg.merge_from_dict({
            "PROBLEM": {"TYPE": "SUPER_RESOLUTION", "NDIM": "3D",
                        "SUPER_RESOLUTION": {"UPSCALING": (2, 2, 2)}},
            "DATA": {"PATCH_SIZE": (8, 32, 32, 1),
                     "NORMALIZATION": {"TYPE": "div"}},
            "MODEL": {"ARCHITECTURE": arch},
            "TRAIN": {"ENABLE": True},
        })
        update_dependencies(cfg, "/tmp", "t")  # widens 3D overlap/padding
        return cfg

    check_configuration(cfg_with("rcan"))
    check_configuration(cfg_with("dfcan"))
    for bad in ("edsr", "wdsr"):
        with pytest.raises(ValueError, match="2D architecture"):
            check_configuration(cfg_with(bad))


@pytest.mark.slow
def test_sr_3d_rcan_e2e(tmp_path):
    """3D super-resolution e2e with RCAN (reference supports 3D rcan;
    run_checks 3D SR jobs use the same data layout)."""
    import os

    from biapy_tpu._biapy import BiaPy
    from biapy_tpu.data.tiff import write_tiff

    rng = np.random.default_rng(7)
    root = str(tmp_path)
    for d, n in (("train", 6), ("test", 2)):
        os.makedirs(f"{root}/{d}/lr")
        os.makedirs(f"{root}/{d}/hr")
        for i in range(n):
            hr = rng.random((8, 32, 32), np.float32)
            lr = hr[::2, ::2, ::2]
            write_tiff(f"{root}/{d}/hr/{i}.tif", (hr * 255).astype(np.uint8))
            write_tiff(f"{root}/{d}/lr/{i}.tif", (lr * 255).astype(np.uint8))
    cfg = {
        "PROBLEM": {"TYPE": "SUPER_RESOLUTION", "NDIM": "3D",
                    "SUPER_RESOLUTION": {"UPSCALING": (2, 2, 2)}},
        "DATA": {"PATCH_SIZE": (4, 16, 16, 1),
                 "NORMALIZATION": {"TYPE": "div"},
                 "TRAIN": {"PATH": f"{root}/train/lr",
                           "GT_PATH": f"{root}/train/hr", "IN_MEMORY": True},
                 "VAL": {"SPLIT_TRAIN": 0.34},
                 "TEST": {"PATH": f"{root}/test/lr",
                          "GT_PATH": f"{root}/test/hr", "IN_MEMORY": True,
                          "LOAD_GT": True}},
        "AUGMENTOR": {"ENABLE": False},
        "MODEL": {"ARCHITECTURE": "rcan", "RCAN_CONV_FILTERS": 8,
                  "RCAN_RG_BLOCK_NUM": 1, "RCAN_RCAB_BLOCK_NUM": 1,
                  "RCAN_REDUCTION_RATIO": 4},
        "TRAIN": {"ENABLE": True, "OPTIMIZER": "ADAMW", "LR": 1.0e-3,
                  "BATCH_SIZE": 2, "EPOCHS": 2},
        "TEST": {"ENABLE": True, "METRICS": ["psnr"]},
    }
    job = BiaPy(cfg, result_dir=os.path.join(root, "results"), name="sr3drcan",
                silent=True)
    job.run_job()
    assert "psnr" in job.workflow.stats and np.isfinite(job.workflow.stats["psnr"])
