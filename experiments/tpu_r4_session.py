"""Round-4 TPU measurement session: the full kernel A/B matrix, now on
the FIXED multi-chunk kernel (VERDICT r3 items 1/3/4/8).

Reuses tpu_r3_session's stage functions (same A/B matrix: v6 windows,
reduce2, bf16, int8 lidx, resident vs prefetch x, chunk sweep, streamed
y, grad, fused SpMM) with two changes:

* results -> ``experiments/results/tpu_r4_results.jsonl``;
* EVERY attempted stage appends a record — failures carry
  ``{"ok": false, "error": ...}`` so the failure telemetry survives the
  environment (round 3 lost its ~30 failure records with /tmp).

The canary ladder now covers the round-3 failure dimensions up front:
multi-chunk, windowed dynamic-offset store, prefetch-x, shard_map
(tpu_r4_canary.py runs them as stages 0a-0d).

Run serially, backgrounded, per CLAUDE.md tunnel discipline:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      experiments/tpu_r4_session.py > /tmp/tpu_r4.log 2>&1 &
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tpu_r3_session as s3
import tpu_r4_canary as can

QUICK = os.environ.get("SMVP_SESSION_QUICK") == "1"
RESULTS = os.path.join(
    os.path.dirname(__file__), "results",
    "tpu_r4_results_quick.jsonl" if QUICK else "tpu_r4_results.jsonl",
)
s3.RESULTS = RESULTS  # stage functions append here
can.RESULTS = RESULTS


def _record(rec):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _attempt(fn, name, kw):
    """Run one stage; on failure persist an error record (ok=False)."""
    try:
        fn(name, **kw)
        return True
    except Exception as e:  # noqa: BLE001 — record and continue
        label = kw.get("label", "")
        print(f"{name} {label} FAILED: {str(e)[:300]}", flush=True)
        _record({
            "ts": time.time(), "name": name, "label": label.strip(),
            "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:500]}",
            "kw": {k: str(v) for k, v in kw.items()},
        })
        return False


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # 0. Canary ladder over the round-3 failure dimensions (each one
    # cheap compile; failures recorded but the session continues — the
    # per-stage records say which configs work).
    can.stage("multichunk-memplus", can.canary_multichunk)
    can.stage("windowed-reduce-banded", can.canary_windowed)
    can.stage("prefetch-x-memplus", can.canary_prefetch)
    can.stage("shardmap-1chip-curtis54", can.canary_shardmap)

    stages = [
        ("memplus", dict(label=" f32")),
        ("memplus", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("pwt", dict(label=" f32")),
        ("pwt", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("memplus", dict(resident=False, label=" f32-prefetchwin")),
        ("memplus", dict(lidx32=True, label=" f32-lidx32")),
        ("memplus", dict(precision=jax.lax.Precision.HIGH,
                         label=" f32-HIGH")),
        ("memplus", dict(value_dtype=jnp.bfloat16, reduce2=True,
                         label=" bf16-reduce2")),
        ("memplus", dict(reduce2=True, label=" f32-reduce2")),
        # NOWINDOW A/B: quantify what the windowed reduce (v6) buys on
        # hardware — nothing in round <= 3 ever measured it.
        ("memplus", dict(label=" f32-nowindow", nowindow=True)),
        # Chunk sweep — the autotuner calibration set.
        ("memplus", dict(chunk=512, label=" f32-c512")),
        ("memplus", dict(chunk=256, label=" f32-c256")),
        ("memplus", dict(chunk=2048, label=" f32-c2048")),
        ("pwt", dict(chunk=512, label=" f32-c512")),
        ("pwt", dict(chunk=256, label=" f32-c256")),
        ("memplus", dict(value_dtype=jnp.bfloat16, chunk=512,
                         label=" bf16-c512")),
        # 10M-nnz scaling config (~150 MB plane upload; after the small
        # stages).
        ("synth-10M", dict(iterations=50, label=" f32")),
        ("synth-10M", dict(value_dtype=jnp.bfloat16, iterations=50,
                           label=" bf16")),
        ("synth-10M", dict(chunk=512, iterations=50, label=" f32-c512")),
        # v7 streamed y.
        ("synth-40k", dict(time_it=False, stream=True, chunk=256,
                           y_block_rows=2048, label=" stream-canary")),
        ("synth-4M", dict(iterations=50, stream=True,
                          label=" f32-stream")),
        ("synth-10M", dict(iterations=50, stream=True,
                           label=" f32-stream")),
    ]
    for name, kw in stages:
        if kw.pop("nowindow", False):
            os.environ["SMVP_SELL_NOWINDOW"] = "1"
            try:
                _attempt(s3.run, name, kw)
            finally:
                os.environ.pop("SMVP_SELL_NOWINDOW", None)
            continue
        _attempt(s3.run, name, kw)

    for gname, gkw in [
        ("memplus", dict(label=" grad-f32")),
        ("synth-10M", dict(iterations=20, label=" grad-f32")),
    ]:
        _attempt(s3.run_grad, gname, gkw)

    for sname, skw in [
        ("memplus", dict(k=8, fused=True, label=" spmm8-fused")),
        ("memplus", dict(k=8, fused=False, label=" spmm8-vmap")),
        ("pwt", dict(k=8, fused=True, label=" spmm8-fused")),
        ("pwt", dict(k=8, fused=False, label=" spmm8-vmap")),
        ("memplus", dict(k=16, fused=True, label=" spmm16-fused")),
    ]:
        _attempt(s3.run_spmm, sname, skw)

    # Autotuner calibration on the measured rows (VERDICT item 4).
    try:
        from smvp_toolkit_tpu.ops.autotune import (
            calibrate_rates, check_pick_plan,
        )

        with open(RESULTS) as f:
            records = [json.loads(ln) for ln in f if ln.strip()]
        rates = calibrate_rates(records)
        print(f"calibrated RATES: {rates}", flush=True)
        cal_path = os.path.join(
            os.path.dirname(RESULTS),
            "autotune_rates_quick.json" if QUICK else "autotune_rates.json",
        )
        with open(cal_path, "w") as f:
            json.dump(rates, f, indent=1)
        for verdict in check_pick_plan(records, rates):
            print(f"pick_plan check: {verdict}", flush=True)
    except Exception as e:
        print(f"calibration step failed: {str(e)[:300]}", flush=True)
    print(f"session total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
