"""Dump every collective in the compiled sharded train step
(8 virtual CPU devices) with operand/result shapes and replica groups —
groundwork for tests/test_ici_bytes.py (VERDICT r4 next#4).

Usage: python exp/ici_bytes_dump.py [model_axis] [exchange] [grad_exchange]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    model_axis = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    exchange = sys.argv[2] if len(sys.argv) > 2 else "a2a"
    grad_exchange = sys.argv[3] if len(sys.argv) > 3 else "allgather"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import __graft_entry__ as ge
    from tossctr_tpu.parallel.mesh import build_mesh
    from tossctr_tpu.parallel.sharding import batch_sharding
    from tossctr_tpu.train.trainer import (
        build_model, make_optimizer, make_train_step, setup_sharded_state,
    )

    devices = jax.devices()[:8]
    data_axis = 8 // model_axis
    mesh = build_mesh(data=data_axis, model=model_axis, devices=devices)
    cfg, n_num = ge._flagship_cfg(tiny=True)
    cfg.train.embedding_optimizer = "rowwise_adagrad"
    cfg.mesh.exchange = exchange
    cfg.mesh.grad_exchange = grad_exchange
    cfg.model.fused_seq_tables = True
    bs = cfg.train.batch_size
    dims = {"X_num": n_num, "X_mask": n_num,
            "X_cat": len(cfg.data.cat_cols), "seq_len": cfg.sequence.max_len}
    model = build_model(cfg, dims, mesh=mesh)
    batch = ge._batch_for(cfg, n_num, bs, with_labels=True)
    tx, schedule = make_optimizer(cfg, steps_per_epoch=10)
    state, ema_mask, s_sh, _ = setup_sharded_state(
        cfg, model, tx, {k: v for k, v in batch.items() if k != "y"},
        jax.random.PRNGKey(0), mesh,
    )
    batch_dev = batch_sharding(mesh)(batch)
    train_step = make_train_step(
        model, tx, cfg, jax.random.PRNGKey(1), ema_mask=ema_mask,
        schedule=schedule, state_sharding=s_sh, mesh=mesh,
    )
    text = train_step.lower(state, batch_dev).compile().as_text()
    print(f"# cfg: B={bs} L={cfg.sequence.max_len} K={cfg.sequence.top_k} "
          f"D={cfg.model.emb_dim} V={cfg.model.seq_vocab} "
          f"table_dtype={cfg.model.table_dtype} mesh={data_axis}x{model_axis} "
          f"exchange={exchange} grad_exchange={grad_exchange}")
    pat = re.compile(
        r"^\s*(?:ROOT )?%?[\w\.\-]+ = (.+?) (all-to-all|all-gather|"
        r"all-reduce|reduce-scatter|collective-permute)"
        r"(?:-start|-done)?\((.*)$",
    )
    for line in text.splitlines():
        m = pat.match(line)
        if m:
            shape, op, rest = m.groups()
            rg = re.search(r"replica_groups=(\{\{[^}]*(?:\},\{[^}]*)*\}\}|\[[^\]]*\]<=\[\d+\])", line)
            print(f"{op:20s} shape={shape[:90]:92s} groups={rg.group(1) if rg else '?'}")


if __name__ == "__main__":
    main()
