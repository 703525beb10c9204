"""Numeric / binary feature "tokenization" embeddings.

Reference (src/models/feature_embed.py:5-48): each scalar feature j gets
a learned slope vector (F, f_embed) (+ bias for numerics), then a shared
bias-free projection to the model dim: (B,F) -> (B,F,D).  One einsum
each; the per-feature slope multiply and shared projection fuse into a
single (B,F,f_embed)x(f_embed,D) batched matmul on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NumericFeatureEmbedding(nn.Module):
    n_features: int
    f_embed: int
    out_dim: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, F) -> (B, F, D)
        assert x.shape[-1] == self.n_features, (x.shape, self.n_features)
        w = self.param(
            "weight", nn.initializers.normal(0.02), (self.n_features, self.f_embed), jnp.float32
        )
        e = x[..., None].astype(self.dtype) * w.astype(self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.n_features, self.f_embed), jnp.float32
            )
            e = e + b.astype(self.dtype)
        return nn.Dense(
            self.out_dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="out_proj",
        )(e)


class BinaryFeatureEmbedding(NumericFeatureEmbedding):
    """Same mechanics for 0/1 isna masks, bias off by default
    (reference feature_embed.py:29-48)."""

    use_bias: bool = False
