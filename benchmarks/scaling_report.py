"""Generate SCALING.md + scaling.json from the ICI/HBM traffic model.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python benchmarks/scaling_report.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from smvp_toolkit_tpu.io.mtx import read_mtx
from smvp_toolkit_tpu.ops.sell_plan import build_sell_plan
from smvp_toolkit_tpu.parallel.traffic import (
    V5E_HBM_GBS,
    V5E_ICI_GBS,
    scaling_projection,
)
from smvp_toolkit_tpu.utils.synth import synth_banded

OUT_MD = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
OUT_JSON = os.path.join(os.path.dirname(__file__), "scaling.json")

DEVICES = [1, 2, 4, 8, 16, 64, 256]


def load(name):
    if name == "synth-10M":
        coo = synth_banded(1_000_000, nnz_per_row=10, bandwidth=256,
                           seed=0).pad(512)
    else:
        coo = read_mtx(
            f"/root/reference/sample-data/{name}.mtx"
        ).pad(512)
    r, c, v = coo.to_numpy()
    return (np.asarray(r, np.int64), np.asarray(c, np.int64),
            np.asarray(v, np.float32), coo.shape, coo.nnz)


def main():
    all_rows = {}
    md = []
    md.append("# Multi-chip scaling: traffic model and projections\n")
    md.append(
        "Per-device, per-iteration HBM and ICI byte accounting for the\n"
        "sharded SpMV paths (`parallel/traffic.py`), derived from the\n"
        "actual SELL plans, projected through the roofline\n"
        "`t = max(t_hbm, t_ici, t_compute)` with the measured\n"
        "single-chip constants (PERFORMANCE.md slot-rate law; HBM at\n"
        f"the measured {V5E_HBM_GBS:.0f} GB/s stream ceiling) and a\n"
        f"labeled v5e ICI figure ({V5E_ICI_GBS:.0f} GB/s per chip —\n"
        "NOT measurable in this single-chip environment; recalibrate\n"
        "on a pod slice).\n\n"
        "The collective charged is what an ITERATIVE consumer pays\n"
        "(solvers re-forming their next input): row-block DP pays an\n"
        "all-gather of y, stripes a psum, the 2-D grid a psum along\n"
        "device columns + all-gather along rows. A one-shot y = A·x\n"
        "with row-sharded output pays nothing. The D = 1 limit has no\n"
        "ICI term — the model degenerates to the unsharded kernel,\n"
        "consistent with the measured 97% sharded retention at one\n"
        "chip (the 3% is shard_map launch glue, not traffic).\n")
    for name in ["memplus", "pwt", "synth-10M"]:
        r, c, v, shape, nnz = load(name)
        plan = build_sell_plan(r, c, v, shape, chunk=2048)
        all_rows[name] = {}
        md.append(f"\n## {name} (nnz={nnz})\n")
        for scheme in ["rowblock", "stripe", "2d"]:
            rows = scaling_projection(
                plan, shape[0], shape[1], DEVICES, scheme,
            )
            all_rows[name][scheme] = rows
            md.append(f"\n### scheme: {scheme}\n")
            md.append(
                "| D | iter µs | bound | HBM MB/dev | ICI MB/dev | "
                "collectives | efficiency |"
            )
            md.append("|---|---|---|---|---|---|---|")
            for row in rows:
                md.append(
                    f"| {row['devices']} | {row['iter_us']:.1f} | "
                    f"{row['bound']} | "
                    f"{row['hbm_bytes']/1e6:.2f} | "
                    f"{row['ici_bytes']/1e6:.2f} | "
                    f"{','.join(row['collectives']) or '—'} | "
                    f"{row['efficiency']:.2f} |"
                )
    md.append(
        "\n\n## Reading the projections\n\n"
        "* **Row-block DP** stays compute/HBM-bound until the\n"
        "  all-gather of y (~4·nrows bytes across the ring) rivals the\n"
        "  shrinking local plane traffic — for synth-10M that is the\n"
        "  D where 4 MB of y meets (planes/D); efficiency declines\n"
        "  smoothly, not a cliff.\n"
        "* **Stripes** pay a psum of the FULL y regardless of D — the\n"
        "  model shows why the row-block layout is the production\n"
        "  default.\n"
        "* **2-D** splits both axes; its collectives roughly match\n"
        "  row-block's (the replicated-y all-gather along device rows\n"
        "  moves the same ring volume) — its real win is x-SHARDING:\n"
        "  local HBM bytes and x capacity scale with dpr, which is\n"
        "  what matters when x no longer fits one chip.\n"
        "* Small matrices (memplus-class) stop scaling early: the\n"
        "  per-device work underruns the per-step overheads the model\n"
        "  does not charge (launch glue ~3%, measured) long before\n"
        "  ICI matters.\n\n"
        "`benchmarks/scaling.json` carries the same rows\n"
        "machine-readably; `__graft_entry__.dryrun_multichip` asserts\n"
        "the accounting invariants (per-device plane bytes sum to the\n"
        "global plan within padding, collective bytes follow the ring\n"
        "formulas).\n"
    )
    with open(OUT_MD, "w") as f:
        f.write("\n".join(md) + "\n")
    with open(OUT_JSON, "w") as f:
        json.dump(all_rows, f, indent=1)
    print(f"wrote {OUT_MD} and {OUT_JSON}")


if __name__ == "__main__":
    main()
