"""2-process jax.distributed worker for tests/test_multihost.py.

Each process owns half the rows of a deterministic (16, 4) global batch,
assembles the global array with ``jax.make_array_from_process_local_data``,
and computes ``mean(x * 2)`` under jit with a data-sharded input — the
mean over a sharded array lowers to an XLA cross-process reduction, so
matching the single-process value proves both the assembly and the
collective path work.  Result is written to TOSSCTR_MH_OUT.
"""

import os

import numpy as np


def main() -> None:
    port = os.environ["TOSSCTR_MH_PORT"]
    pid = int(os.environ["TOSSCTR_MH_PID"])
    out_path = os.environ["TOSSCTR_MH_OUT"]

    import jax

    # this machine force-registers a TPU-tunnel backend via sitecustomize;
    # the only reliable CPU pin is the config knob before first backend use
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())  # global devices, process-ordered
    mesh = Mesh(devs.reshape(devs.size, 1), ("data", "model"))

    rng = np.random.default_rng(123)
    x_global = rng.normal(0, 1, (16, 4)).astype(np.float32)

    # rows owned by this process = union of its devices' row blocks
    n_data = devs.size
    rows_per = 16 // n_data
    local_blocks = [
        x_global[i * rows_per : (i + 1) * rows_per]
        for i in range(n_data)
        if devs[i].process_index == jax.process_index()
    ]
    local = np.concatenate(local_blocks)
    sharding = NamedSharding(mesh, P("data", None))
    gx = jax.make_array_from_process_local_data(sharding, local, (16, 4))

    @jax.jit
    def f(x):
        return jnp.mean(x * 2.0)

    val = float(jax.device_get(f(gx)))
    with open(out_path, "w") as fh:
        fh.write(f"{val:.9f}\n")


if __name__ == "__main__":
    main()
