"""Shared flax building blocks: norms, positional bias, attention.

Semantics mirror the reference's torch modules (src/models/dare.py:6-70)
with flax idiom: fp32 params, configurable compute dtype (bf16 under
amp), explicit dropout RNGs.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class RMSNorm(nn.Module):
    """w * x * rsqrt(mean(x^2) + eps)  (reference dare.py:6-13)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        w = self.param("w", nn.initializers.ones, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (w * y).astype(self.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32)(x)


def dropout_seed(module: nn.Module, p: float, deterministic: bool):
    """-> (effective p, int32 (1,) seed) for the counter-based kernel
    dropout; draws from the module's 'dropout' rng stream only when
    active so fused and unfused paths consume rng identically."""
    p = float(p) if not deterministic else 0.0
    if p > 0.0:
        return p, jax.random.randint(
            module.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
        )
    return p, jnp.zeros((1,), jnp.int32)


def make_norm(kind: str, dtype: Dtype = jnp.float32, name: Optional[str] = None):
    """'rms' -> RMSNorm else LayerNorm (reference dare.py:15-18)."""
    if kind.lower() == "rms":
        return RMSNorm(dtype=dtype, name=name)
    return LayerNorm(dtype=dtype, name=name)


class PositionalBias(nn.Module):
    """Relative positional bias over the K selected tokens: a
    (2*max_len+1, n_heads) embedding of clipped distance j-i
    (reference dare.py:20-37).  The reference then AVERAGES the bias
    over heads into a single (K,K) additive mask (dare.py:56-60) —
    a faithful quirk preserved by the caller."""

    max_len: int
    n_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qlen: int, klen: int):
        rel = self.param(
            "rel",
            nn.initializers.normal(1.0),
            (2 * self.max_len + 1, self.n_heads),
            jnp.float32,
        )
        i = jnp.arange(qlen)[:, None]
        j = jnp.arange(klen)[None, :]
        d = jnp.clip(j - i, -self.max_len, self.max_len) + self.max_len
        bias = jnp.take(rel, d, axis=0)  # (qlen, klen, H)
        return jnp.transpose(bias, (2, 0, 1)).astype(self.dtype)  # (H, qlen, klen)


class MultiHeadSelfAttention(nn.Module):
    """Standard MHA with packed qkv projection and an optional additive
    attention bias shared across heads — matching torch
    nn.MultiheadAttention's math (softmax((qk^T)/sqrt(dh) + bias) v)
    including attention-probability dropout.

    ``use_pallas`` swaps the attention core for the fused VMEM kernel
    (ops/pallas_attention.py); the parameter tree is identical in both
    modes, so checkpoints are portable across backends."""

    d_model: int
    n_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    # fold the qkv projection into the attention kernel (pallas mode
    # only): the (B, K, 3D) qkv tensor never exists in HBM and none of
    # the split/bias relayout copies are emitted.  Param tree identical
    # either way (DenseParams declares the same {kernel, bias}).
    fuse_qkv: bool = True
    # return (o, wout, bout) instead of applying the out projection —
    # the caller folds it into the fused block-tail kernel; the "out"
    # params stay declared HERE so the tree path (mha/out/{kernel,
    # bias}) is identical in every mode
    raw_out: bool = False
    attn_impl: str = "packed"  # packed | wide | loop kernel geometry
    # "hash" = numpy-reproducible counter-hash dropout mask; "hw" = TPU
    # hardware PRNG (~7x fewer VPU ops/element; falls back to hash in
    # interpret mode — see ops/pallas_attention._hw_keep)
    dropout_impl: str = "hash"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jnp.ndarray] = None, deterministic: bool = True):
        B, K, D = x.shape
        H = self.n_heads
        dh = D // H
        assert D % H == 0, "d_model must divide n_heads"
        assert not self.raw_out or (self.use_pallas and self.fuse_qkv), (
            "raw_out requires the fused-qkv pallas path"
        )

        def bias2d():
            return (
                attn_bias.reshape(K, K).astype(self.dtype)
                if attn_bias is not None
                else jnp.zeros((K, K), self.dtype)
            )

        if self.use_pallas and self.fuse_qkv:
            from ..ops.pallas_attention import fused_mha_qkv

            wqkv, bqkv = DenseParams(D, 3 * D, name="qkv")()
            p, seed = dropout_seed(self, self.dropout, deterministic)
            # block_b=512 is an upper REQUEST: _adaptive_block_packed
            # sizes the real block from the VMEM score budget (128 fwd /
            # 64 bwd at flagship shapes — the measured optimum of the
            # budget x divisor sweep, exp/attn_budget_probe.py); the old
            # hard 64 capped the backward at 32 rows/block
            o = fused_mha_qkv(
                x, wqkv.astype(self.dtype), bqkv, bias2d(), seed, H, p,
                512, False, self.attn_impl, self.dropout_impl,
            )
            if self.raw_out:
                wout, bout = DenseParams(D, D, name="out")()
                return o, wout, bout
            return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="out")(o)

        # NOTE: tried projecting in 2-D ((B*K, 3D) matmul) to avoid the
        # 3-D relayout copies around the bias add — it backfired: XLA
        # gives (M, 64) matmul outputs a column-major {0,1} layout, so
        # every reshape back to (B, K, 64) materializes plus a second
        # copy to the kernel's {2,1,0} operand layout (+29 ms/step at
        # B=8192, bench trace r2c).  The 3-D form's copies are cheaper;
        # the fused_mha_qkv kernel above removes them entirely.
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.use_pallas:
            from ..ops.pallas_attention import fused_mha

            p, seed = dropout_seed(self, self.dropout, deterministic)
            o = fused_mha(q, k, v, bias2d(), seed, H, p, 64, False,
                          self.attn_impl, self.dropout_impl)
        else:
            def heads(t):
                return t.reshape(B, K, H, dh).transpose(0, 2, 1, 3)  # (B,H,K,dh)

            qh, kh, vh = heads(q), heads(k), heads(v)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
                jnp.asarray(dh, self.dtype)
            )
            if attn_bias is not None:
                logits = logits + attn_bias.astype(logits.dtype)
            w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
            o = o.transpose(0, 2, 1, 3).reshape(B, K, D)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="out")(o)


class NormParams(nn.Module):
    """Declares RMSNorm's {w} param without computing — the norm runs
    inside a fused Pallas kernel (ops/pallas_ffn.fused_block_tail);
    identical param tree to RMSNorm (same guarantee as DenseParams)."""

    dim: int

    @nn.compact
    def __call__(self):
        return self.param("w", nn.initializers.ones, (self.dim,), jnp.float32)


class DenseParams(nn.Module):
    """Declares the same {kernel, bias} params as ``nn.Dense`` without
    computing: used when the matmul runs inside a fused Pallas kernel
    (ops/pallas_ffn.py) so the parameter tree stays byte-identical
    between the fused and unfused paths (checkpoint portability, same
    guarantee as MultiHeadSelfAttention.use_pallas)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.out_dim,), jnp.float32)
        return k, b


class DAREEncoderLayer(nn.Module):
    """Post-norm transformer block over the K selected tokens
    (reference dare.py:39-70): MHA + residual + norm, FFN(GELU) +
    residual + norm, with the head-averaged positional bias as a single
    (K,K) additive mask.

    ``use_pallas_attn`` routes the attention core through the fused
    Pallas kernel (ops/pallas_attention.py): same math, (B,H,K,K)
    probabilities never leave VMEM."""

    d_model: int
    n_heads: int
    mha_dropout: float
    ffn_hidden: int
    ffn_dropout: float
    norm: str = "rms"
    add_pos_bias: bool = True
    max_len: int = 512
    use_pallas_attn: bool = False
    # fused VMEM FFN (ops/pallas_ffn.py): the (B*K, ffn_hidden) hidden
    # activation never hits HBM; identical param tree either way
    use_pallas_ffn: bool = False
    # when both pallas paths are on and norm is rms, run the whole
    # out-proj+residual+norm1+FFN+residual+norm2 stretch as ONE kernel
    # (ops/pallas_ffn.fused_block_tail).  False = separate kernels with
    # the SAME math and param tree (the apples-to-apples baseline).
    # None = on unless TOSSCTR_DISABLE_FUSE_BLOCK=1 (the escape hatch
    # bench.py uses to retry if the fused kernel fails to compile on a
    # backend it has not been validated against).
    fuse_block: Optional[bool] = None
    # logical K when the caller tile-padded the token dim (DARE
    # pad_topk): key columns >= valid_k get -1e9 via the shared additive
    # bias — the same masking the kernels applied internally when THEY
    # did the padding, so the softmax over real tokens is unchanged
    valid_k: Optional[int] = None
    attn_impl: str = "packed"
    dropout_impl: str = "hash"  # hash | hw (see MultiHeadSelfAttention)
    dtype: Dtype = jnp.float32

    def _fuse_block(self) -> bool:
        import os

        if self.fuse_block is not None:
            return self.fuse_block
        return os.environ.get("TOSSCTR_DISABLE_FUSE_BLOCK") != "1"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, K, D = x.shape
        bias2d = None
        if self.add_pos_bias:
            pb = PositionalBias(self.max_len, self.n_heads, dtype=self.dtype, name="pbias")(K, K)
            bias2d = pb.mean(axis=0)  # head-avg quirk (dare.py:60)
        if self.valid_k is not None and self.valid_k < K:
            colmask = jnp.where(
                jnp.arange(K) < self.valid_k,
                jnp.asarray(0.0, self.dtype),
                jnp.asarray(-1e9, self.dtype),
            )[None, :]
            bias2d = colmask if bias2d is None else bias2d + colmask
        if bias2d is not None and bias2d.shape != (K, K):
            bias2d = jnp.broadcast_to(bias2d, (K, K))
        bias = bias2d[None, None, :, :] if bias2d is not None else None

        # fully fused path: attention core kernel + ONE block-tail
        # kernel (out-proj, residual, norm1, FFN, residual, norm2) —
        # nothing between them runs in XLA
        fused_block = (
            self._fuse_block() and self.use_pallas_attn and self.use_pallas_ffn
            and self.norm.lower() == "rms"
        )
        if fused_block:
            from ..ops.pallas_ffn import default_tail_block_n, fused_block_tail

            o, wout, bout = MultiHeadSelfAttention(
                self.d_model, self.n_heads, self.mha_dropout,
                use_pallas=True, raw_out=True, attn_impl=self.attn_impl,
                dropout_impl=self.dropout_impl,
                dtype=self.dtype, name="mha",
            )(x, attn_bias=bias, deterministic=deterministic)
            wn1 = NormParams(D, name="norm1")()
            w1, b1 = DenseParams(D, self.ffn_hidden, name="Dense_0")()
            w2, b2 = DenseParams(self.ffn_hidden, D, name="Dense_1")()
            wn2 = NormParams(D, name="norm2")()
            p, seed = dropout_seed(self, self.ffn_dropout, deterministic)
            y = fused_block_tail(
                x.reshape(B * K, D), o.reshape(B * K, D),
                wout.astype(self.dtype), bout, wn1,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2, wn2,
                seed, p, default_tail_block_n(), False, self.dropout_impl,
            )
            return y.reshape(B, K, D)

        h = MultiHeadSelfAttention(
            self.d_model,
            self.n_heads,
            self.mha_dropout,
            use_pallas=self.use_pallas_attn,
            attn_impl=self.attn_impl,
            dropout_impl=self.dropout_impl,
            dtype=self.dtype,
            name="mha",
        )(x, attn_bias=bias, deterministic=deterministic)
        x = x + h
        x = make_norm(self.norm, self.dtype, name="norm1")(x)
        if self.use_pallas_ffn:
            from ..ops.pallas_ffn import fused_ffn

            w1, b1 = DenseParams(D, self.ffn_hidden, name="Dense_0")()
            w2, b2 = DenseParams(self.ffn_hidden, D, name="Dense_1")()
            p, seed = dropout_seed(self, self.ffn_dropout, deterministic)
            h2 = fused_ffn(
                x.reshape(B * K, D),
                w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, seed, p,
                512, False, self.dropout_impl,
            ).reshape(B, K, D)
        else:
            h2 = nn.Dense(self.ffn_hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
            h2 = nn.gelu(h2)
            h2 = nn.Dropout(self.ffn_dropout)(h2, deterministic=deterministic)
            h2 = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(h2)
        x = x + h2
        x = make_norm(self.norm, self.dtype, name="norm2")(x)
        return x


class SEBlock(nn.Module):
    """Squeeze-excite over channels with BATCH-MEAN statistics —
    a faithful reference quirk (qnn_alpha.py:17-26): the gate is computed
    from x.mean(axis=0), so inference output depends on batch
    composition.  ``batch_stats=False`` gates per-row instead."""

    channels: int
    reduction: int = 8
    batch_stats: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, C)
        c = self.channels
        pooled = x.mean(axis=0, keepdims=True) if self.batch_stats else x
        h = nn.Dense(max(1, c // self.reduction), dtype=self.dtype, param_dtype=jnp.float32)(pooled)
        h = nn.relu(h)
        w = nn.sigmoid(nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(h))
        return x * w
