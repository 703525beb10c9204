"""QNN-alpha feature-interaction head (reference: src/models/qnn_alpha.py:28-130).

Over the (B, F, D) token stack: pre-RMSNorm on the flattened features,
multi-head low-rank FM crosses (ops/fm_cross.py — one fused einsum pair
instead of the reference's Python head loop), optional squeeze-excite
re-weighting (with the reference's batch-mean quirk), then an MLP over
[flattened base ‖ interactions] -> logit.

``use_residual=False`` feeds a stop-gradient copy of the base features,
matching the reference's ``base.detach()`` (qnn_alpha.py:124-127).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fm_cross import fm_cross_blocked, fm_cross_multihead
from .layers import SEBlock, make_norm


class QNNAlpha(nn.Module):
    in_feat: int
    emb_dim: int
    heads: int = 8
    rank: int = 32
    proj_dim: int = 256
    mlp_hidden: Sequence[int] = (512, 256)
    dropout: float = 0.1
    use_se: bool = True
    se_reduction: int = 8
    se_batch_stats: bool = True  # reference quirk (qnn_alpha.py:25)
    use_residual: bool = True
    norm: str = "rms"
    pair_grouping: str = "all"  # all | block
    block_slices: Optional[Dict[str, Tuple[int, int]]] = None
    # fused Pallas FM-cross (ops/pallas_kernels.py): keeps the (B,H,F,R)
    # intermediate in VMEM; used for pair_grouping='all' (the per-block
    # slices of 'block' mode are small enough for the jnp path)
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):  # (B,F,D) -> (B,)
        B, F, D = feats.shape
        assert F == self.in_feat and D == self.emb_dim, (feats.shape, self.in_feat, self.emb_dim)
        z = feats.reshape(B, F * D)
        z = make_norm(self.norm, self.dtype)(z)
        z = z.reshape(B, F, D)

        U = self.param(
            "U", nn.initializers.normal(0.02), (self.heads, D, self.rank), jnp.float32
        ).astype(self.dtype)
        V = self.param(
            "V",
            nn.initializers.normal(0.02),
            (self.heads, self.rank, self.proj_dim),
            jnp.float32,
        ).astype(self.dtype)

        if self.pair_grouping == "block" and self.block_slices:
            inter = fm_cross_blocked(z, U, V, self.block_slices)
        elif self.use_pallas and F % 8 == 0:
            from ..ops.pallas_kernels import fm_cross_pallas

            inter = fm_cross_pallas(z, U, V)
        else:
            inter = fm_cross_multihead(z, U, V)

        if self.use_se:
            inter = SEBlock(
                channels=self.heads * self.proj_dim,
                reduction=self.se_reduction,
                batch_stats=self.se_batch_stats,
                dtype=self.dtype,
                name="se",
            )(inter)
        inter = nn.Dropout(self.dropout)(inter, deterministic=deterministic)

        base = z.reshape(B, F * D)
        if not self.use_residual:
            base = jax.lax.stop_gradient(base)
        out = jnp.concatenate([base, inter], axis=1)

        for i, h in enumerate(self.mlp_hidden):
            out = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name=f"mlp_{i}")(out)
            out = nn.relu(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        logit = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_out")(out)
        return logit[:, 0]
