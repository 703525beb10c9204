"""Host->device transfer bandwidth of this environment's backend.

The production-trainer epoch (scripts/input_pipeline_bench.py) runs at
~2.3k eps vs the 45.4k pre-staged bench — this probe attributes the
gap: each B=8192 flagship batch is ~21 MB of host arrays that must
cross the axon tunnel every step, while bench.py stages 8 batches
once.  Measures device_put MB/s for (a) one flagship batch dict,
(b) a single contiguous 64 MB array, with value-fetch sync.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    B, L, NN, NC = 8192, 400, 82, 35

    def batch(i):
        return {
            "seq": rng.integers(0, 10_000_000, (B, L)).astype(np.int32),
            "X_num": rng.standard_normal((B, NN)).astype(np.float32),
            "X_mask": rng.standard_normal((B, NN)).astype(np.float32),
            "X_cat": rng.integers(0, 1000, (B, NC)).astype(np.int32),
            "y": rng.random(B).astype(np.float32),
        }

    nbytes = sum(a.nbytes for a in batch(0).values())
    print(f"batch bytes: {nbytes / 1e6:.1f} MB", flush=True)

    # distinct host buffers each rep so no transfer can be elided
    bs = [batch(i) for i in range(4)]
    d = jax.device_put(bs[0])
    float(jnp.sum(d["y"]))
    t0 = time.perf_counter()
    REPS = 6
    for i in range(REPS):
        d = jax.device_put(bs[i % 4])
        float(jnp.sum(d["y"]))  # hard sync per transfer
    dt = (time.perf_counter() - t0) / REPS
    print(f"batch device_put: {dt * 1e3:.0f} ms -> "
          f"{nbytes / dt / 1e6:.1f} MB/s -> "
          f"max input-bound eps = {B / dt:,.0f}", flush=True)

    big = [rng.standard_normal(8 * 1024 * 1024).astype(np.float32)
           for _ in range(3)]
    a = jax.device_put(big[0])
    float(jnp.sum(a[:4]))
    t0 = time.perf_counter()
    for i in range(REPS):
        a = jax.device_put(big[i % 3])
        float(jnp.sum(a[:4]))
    dt = (time.perf_counter() - t0) / REPS
    print(f"contiguous 32MB device_put: {dt * 1e3:.0f} ms -> "
          f"{big[0].nbytes / dt / 1e6:.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
