"""Round-4 follow-up session: the stages the first pass lost to the
Precision.HIGH rejection, now running on the reduce2-default bf16 mode,
plus the f32-reduce2 scaling configs the cost model flags as the next
lever (the first pass measured synth-10M MXU-bound on 6-pass HIGHEST).
Appends to the same tpu_r4_results.jsonl.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tpu_r3_session as s3
from tpu_r4_session import RESULTS, _attempt

s3.RESULTS = RESULTS


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) "
          f"[{time.time()-t0:.0f}s]", flush=True)
    stages = [
        ("memplus", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("pwt", dict(value_dtype=jnp.bfloat16, label=" bf16")),
        ("memplus", dict(value_dtype=jnp.bfloat16, chunk=512,
                         label=" bf16-c512")),
        ("synth-10M", dict(value_dtype=jnp.bfloat16, iterations=50,
                           label=" bf16")),
        ("synth-10M", dict(reduce2=True, iterations=50,
                           label=" f32-reduce2")),
        ("synth-10M", dict(value_dtype=jnp.bfloat16, iterations=50,
                           stream=True, label=" bf16-stream")),
        ("pwt", dict(reduce2=True, label=" f32-reduce2")),
    ]
    for name, kw in stages:
        _attempt(s3.run, name, kw)
    print(f"session2 total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
