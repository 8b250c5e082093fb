"""Cost-model predictions for the SELL kernel (no hardware needed).

Prints the modelled single-launch time and Gnnz/s for each benchmark
config from ``ops/autotune.plan_cost_us`` so the first hardware session
can be sanity-checked number-by-number (big deviations = model or
kernel problem to chase). Run: PYTHONPATH= JAX_PLATFORMS=cpu python
experiments/predict.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.autotune import plan_cost_us
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.utils.synth import synth_banded

CONFIGS = [
    # (label, table_passes, reduce_passes, value_bytes)
    ("f32 HIGHEST", 6, 6, 4),
    ("f32 reduce2", 2, 2, 4),
    ("bf16", 1, 3, 2),
    ("bf16 reduce2", 1, 2, 2),
]


def coo_of(name):
    if name == "synth-10M":
        return synth_banded(1_000_000, nnz_per_row=10, bandwidth=256,
                            seed=0).pad(512)
    return read_mtx(f"/root/reference/sample-data/{name}.mtx").pad(512)


def main():
    for name in ("memplus", "pwt", "synth-10M"):
        coo = coo_of(name)
        r, c, v = coo.to_numpy()
        for chunk in (1024, 512, 256):
            plan = build_sell_plan(r, c, v, coo.shape, chunk=chunk)
            occ = coo.nnz / plan.slots()
            line = [f"{name} c{chunk} S={plan.n_sublanes} "
                    f"WT={plan.window_tiles} occ={occ:.2f}:"]
            for label, tp, rp, vb in CONFIGS:
                us = plan_cost_us(plan, vb, table_passes=tp,
                                  reduce_passes=rp)
                gnnz = coo.nnz / us / 1e3
                line.append(f"  {label}: {us:7.1f} us {gnnz:6.2f} Gnnz/s")
            print("\n".join(line), flush=True)


if __name__ == "__main__":
    main()
