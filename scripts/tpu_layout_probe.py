"""Probe: does XLA:TPU tile-pad a (V, 64) table to 128 lanes in HBM?
Compares live-bytes deltas for (10M,64) vs (5M,128) bf16 allocations,
then device-times gather + scatter on split vs merged layouts.
"""

import functools
import time

import numpy as np


def live_bytes(dev):
    s = dev.memory_stats() or {}
    return s.get("bytes_in_use", 0)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("backend:", jax.default_backend())

    base = live_bytes(dev)
    a = jnp.zeros((10_000_000, 64), jnp.bfloat16)
    jax.block_until_ready(a)
    d1 = live_bytes(dev) - base
    b = jnp.zeros((5_000_000, 128), jnp.bfloat16)
    jax.block_until_ready(b)
    d2 = live_bytes(dev) - base - d1
    print(f"(10M,64) bf16 logical 1.28GB -> physical {d1/1e9:.2f} GB")
    print(f"(5M,128) bf16 logical 1.28GB -> physical {d2/1e9:.2f} GB")
    del a, b

    # --- device-timed gather: (V,64) x2 tables vs (V,128) merged ---
    rng = np.random.default_rng(0)
    V, N = 10_000_000, 1_638_400  # B=4096 x L=400
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    t64a = jnp.asarray(rng.normal(0, 1, (V, 64)).astype(np.float32), jnp.bfloat16)
    t64b = t64a + jnp.bfloat16(1)
    t128 = jnp.concatenate([t64a, t64b], axis=1)
    jax.block_until_ready((t64a, t64b, t128))

    @jax.jit
    def gather_split(ta, tb, ids):
        ra = jnp.take(ta, ids, axis=0)
        rb = jnp.take(tb, ids, axis=0)
        return ra.sum(dtype=jnp.float32) + rb.sum(dtype=jnp.float32), ids + 1

    @jax.jit
    def gather_merged(t, ids):
        r = jnp.take(t, ids, axis=0)
        return r.sum(dtype=jnp.float32), ids + 1

    @jax.jit
    def gather_att_only_split(ta, ids):
        return jnp.take(ta, ids, axis=0).sum(dtype=jnp.float32), ids + 1

    @jax.jit
    def gather_att_only_merged(t, ids):
        return jnp.take(t, ids, axis=0)[:, :64].sum(dtype=jnp.float32), ids + 1

    runs = [
        ("gather both, split", lambda i: gather_split(t64a, t64b, i)),
        ("gather both, merged", lambda i: gather_merged(t128, i)),
        ("gather att, split", lambda i: gather_att_only_split(t64a, i)),
        ("gather att, merged+slice", lambda i: gather_att_only_merged(t128, i)),
    ]
    for name, fn in runs:
        s, i2 = fn(ids)
        jax.block_until_ready(s)
        jax.profiler.start_trace(f"/tmp/layout_probe/{name.replace(' ', '_').replace(',', '')}")
        cur = i2 % V
        for _ in range(4):
            s, cur = fn(cur)
            cur = cur % V
        jax.block_until_ready(s)
        jax.profiler.stop_trace()

    from tossctr_tpu.utils.trace import find_trace_file, load_device_events

    for name, _ in runs:
        d = f"/tmp/layout_probe/{name.replace(' ', '_').replace(',', '')}"
        tp = find_trace_file(d)
        tot = sum(e.get("dur", 0) for e in load_device_events(tp)) / 1e3 if tp else -1
        print(f"{name}: {tot/4:.2f} ms/call device")

    # --- scatter: 2x (V,64) vs 1x (V,128) ---
    Nu = 245_760
    uids = jnp.asarray(rng.integers(0, V, Nu).astype(np.int32))
    da = jnp.asarray(rng.normal(0, 1e-3, (Nu, 64)), jnp.bfloat16)
    dm = jnp.concatenate([da, da], axis=1)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scat_split(ta, tb, ids, d):
        return ta.at[ids].add(d), tb.at[ids].add(d), ids + 1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scat_merged(t, ids, d):
        return t.at[ids].add(d), ids + 1

    ta, tb = t64a, t64b
    ta, tb, i2 = scat_split(ta, tb, uids, da)
    jax.block_until_ready((ta, tb))
    jax.profiler.start_trace("/tmp/layout_probe/scat_split")
    cur = i2 % V
    for _ in range(4):
        ta, tb, cur = scat_split(ta, tb, cur % V, da)
    jax.block_until_ready((ta, tb))
    jax.profiler.stop_trace()

    t = t128
    t, i2 = scat_merged(t, uids, dm)
    jax.block_until_ready(t)
    jax.profiler.start_trace("/tmp/layout_probe/scat_merged")
    cur = i2 % V
    for _ in range(4):
        t, cur = scat_merged(t, cur % V, dm)
    jax.block_until_ready(t)
    jax.profiler.stop_trace()

    for name in ("scat_split", "scat_merged"):
        tp = find_trace_file(f"/tmp/layout_probe/{name}")
        tot = sum(e.get("dur", 0) for e in load_device_events(tp)) / 1e3 if tp else -1
        print(f"{name}: {tot/4:.2f} ms/call device")


if __name__ == "__main__":
    main()
