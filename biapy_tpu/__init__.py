"""biapy_tpu: a TPU-native (JAX/XLA/Pallas) bioimage-analysis framework with
the capabilities of BiaPy (reference: /root/reference, BiaPy v3.7.0).

CLI analog of the reference's biapy/__init__.py:main — argparse entry that
builds a BiaPy job and runs it. No torch.distributed launcher is needed:
multi-host TPU jobs run one process per host and call
jax.distributed.initialize internally.
"""

__version__ = "0.1.0"

import argparse
import os


def main():
    # Flag surface mirrors the reference CLI (biapy/__init__.py:104-137) so
    # existing launch scripts run unchanged; torch.distributed flags are
    # accepted and ignored (XLA owns device placement and collectives).
    parser = argparse.ArgumentParser(description="biapy_tpu job runner")
    parser.add_argument("--config", required=True, help="Path to the YAML configuration file")
    parser.add_argument("--result_dir", default=os.getenv("HOME", "."), help="Where results are stored")
    parser.add_argument("--name", default="unknown_job", help="Job name")
    parser.add_argument("--run_id", type=int, default=1, help="Run number for the same job")
    parser.add_argument("--gpu", default=None, help="Ignored (TPU devices are auto-detected)")
    parser.add_argument("-v", "--version", action="version",
                        version="biapy_tpu version " + __version__)
    parser.add_argument("--world_size", type=int, default=1,
                        help="Ignored (one process per TPU host; jax.distributed)")
    parser.add_argument("--local_rank", type=int, default=-1,
                        help="Ignored (no torch.distributed.launch)")
    parser.add_argument("--dist_on_itp", action="store_true", help="Ignored")
    parser.add_argument("--dist_url", default="env://", help="Ignored")
    parser.add_argument("--dist_backend", default="ici",
                        choices=["ici", "dcn", "nccl", "gloo"],
                        help="Interconnect preference hint; torch values "
                             "(nccl/gloo) are accepted and ignored")
    args = parser.parse_args()
    if args.dist_backend in ("nccl", "gloo"):
        args.dist_backend = "ici"

    from biapy_tpu._biapy import BiaPy

    job = BiaPy(**vars(args))
    job.run_job()


def _lazy(name):
    import importlib

    return importlib.import_module(name)


def __getattr__(name):
    if name in ("BiaPy", "build_config"):
        from biapy_tpu import _biapy

        return getattr(_biapy, name)
    raise AttributeError(name)
