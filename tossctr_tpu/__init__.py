"""tossctr_tpu — a TPU-native CTR prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference pipeline (biyotteu/toss-next-ctr-prediction): streaming
Parquet -> shard-cache ETL, DARE sequence encoder + QNN-alpha
feature-interaction head, K-fold training with EMA / calibration /
ensembling, and a sharded (Mesh + pjit) execution model for multi-chip
TPU slices.

Layer map (mirrors reference layers L0-L7, see SURVEY.md):
  config/    L0  typed config schema + YAML loader
  data/      L1+L2 offline ETL (shard cache) and online loading
  features/  covis feature engineering
  models/    L3  flax model stack (feature embeds, DARE, QNN-alpha)
  ops/       jnp reference ops + Pallas TPU kernels
  parallel/  mesh / sharding / row-sharded embedding exchange
  train/     L4  jitted train loop, EMA, schedules, checkpoints
  eval/      metrics (AP / WLL / Score), calibration
  infer/     L5  fold ensembling + submission writer
  tools/     L7  CLI utilities
  utils/     L6  seeding, logging, hashing
"""

__version__ = "0.1.0"
