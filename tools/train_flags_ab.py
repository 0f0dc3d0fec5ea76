"""A/B the bench train step across XLA flag sets and step variants.

Each variant runs in a SUBPROCESS (XLA flags are process-wide at backend
init; env knobs are read at trace time). Prints it/s per variant.

Usage: python tools/train_flags_ab.py [n_steps]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r5 chip measurements (v5e, bench train step, batch 1): old defaults
# 11.45 it/s; +repeat4d 12.16; +fusedxla 12.30 -> both are now the
# defaults. --xla_tpu_scoped_vmem_limit_kib is NOT a known flag on the
# axon runtime (hard abort at backend init), dropped from the sweep.
VARIANTS = [
    ("defaults (repeat4d+fusedxla)", {}),
    ("pool_bwd_6d", {"BIAPY_TPU_POOL_BWD": "6d"}),
    ("convt_pertap", {"BIAPY_TPU_CONVT": "pertap"}),
    ("old_defaults",
     {"BIAPY_TPU_POOL_BWD": "6d", "BIAPY_TPU_CONVT": "pertap"}),
]


def main():
    n = sys.argv[1] if len(sys.argv) > 1 else "1"
    for name, env in VARIANTS:
        e = dict(os.environ)
        for k, v in env.items():
            e[k] = (e.get(k, "") + " " + v).strip() if k == "XLA_FLAGS" else v
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train_ab.py"), n],
            env=e, capture_output=True, text=True, timeout=1200)
        line = [ln for ln in r.stdout.splitlines() if "it/s" in ln]
        print(f"{name:32s} {line[-1] if line else 'FAILED: ' + r.stderr[-200:]}")


if __name__ == "__main__":
    main()
