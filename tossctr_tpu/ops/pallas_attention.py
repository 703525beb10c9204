"""Fused multi-head self-attention over the K selected tokens.

Why: the DARE transformer runs MHA over K≈60 tokens with 8 heads of
width 8 (reference dare.py:39-70).  XLA lowers the per-head einsums to
tiny (60x8)@(8x60) contractions with transposes in between and
materializes the (B,H,K,K) probability tensor in HBM — measured as the
dominant cost of the whole train step on v5e.  This kernel computes
softmax((QK^T)/sqrt(dh) + bias)V for ALL heads inside VMEM per batch
block and writes only the (B,K,D) output.

Layout trick: tensors stay in (Bb, K, D) layout end-to-end.  For head h
with dim slice m_h, S_h = (Q∘m_h) K^T is a full-D contraction (zeros
outside the head's dims contribute nothing), and O accumulates
Σ_h P_h (V∘m_h).  That turns H tiny dh-contractions into H D-wide MXU
matmuls and avoids every reshape/transpose across the lane dimension.

Attention-probability dropout (torch nn.MultiheadAttention semantics)
runs in-kernel with a counter-based hash of the absolute
(row, query, key, head, seed) coordinates — NOT the stateful TPU PRNG —
so the backward kernel regenerates the bitwise-identical keep-mask even
though it runs with a different batch-block size, and the mask is
reproducible in pure numpy for testing (tests/test_pallas_attention.py).

The head-averaged additive bias quirk (dare.py:56-60) is an explicit
(K, K) input shared by all heads; its gradient accumulates across the
sequential grid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tossctr_tpu.ops._vmem import kernel_compiler_params


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resolve_interpret(interpret: bool) -> bool:
    # compiled Mosaic kernels need a TPU; fall back to the interpreter on
    # CPU/GPU so the ops work (slowly) on any backend
    return bool(interpret) or jax.default_backend() != "tpu" 


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _head_mask(h, dh: int, D: int):
    """(1,1,D) float mask of head h's dim slice, built from iota so the
    kernel captures no array constants.  ``h`` may be a traced loop
    index (the head loop is a fori_loop so only one head's working set
    is live in VMEM at a time)."""
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    return ((d_idx >= h * dh) & (d_idx < (h + 1) * dh)).astype(jnp.float32)


# murmur3-style finalizer constants (public-domain avalanche mix)
_MIX_R = np.uint32(0x9E3779B1)
_MIX_Q = np.uint32(0x85EBCA77)
_MIX_K = np.uint32(0xC2B2AE3D)
_MIX_H = np.uint32(0x27D4EB2F)
_MIX_S = np.uint32(0x165667B1)
_FMIX_C1 = np.uint32(0x7FEB352D)
_FMIX_C2 = np.uint32(0x846CA68B)


def _fmix32(x):
    x = x ^ (x >> 16)
    x = x * _FMIX_C1
    x = x ^ (x >> 15)
    x = x * _FMIX_C2
    x = x ^ (x >> 16)
    return x


def _dropout_keep(shape, p: float, seed, head, row0):
    """Keep-mask scaled by 1/(1-p), a pure function of the absolute
    (row, q, k, head, seed) coordinates: block-size independent, so the
    forward and backward kernels regenerate the identical mask despite
    different batch blockings.  ``row0`` = this block's first global row."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0.astype(jnp.uint32)
    qi = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    kj = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    x = (
        r * _MIX_R
        + qi * _MIX_Q
        + kj * _MIX_K
        + head.astype(jnp.uint32) * _MIX_H
        + seed.astype(jnp.uint32) * _MIX_S
    )
    x = _fmix32(x)
    keep = (x >= np.uint32(int(p * (2**32)))).astype(jnp.float32)
    return keep / (1.0 - p)


# --- hardware-PRNG dropout (dropout_impl="hw") ------------------------------
#
# The counter hash above costs ~15 uint32 VPU ops per score element and
# runs over ~268M elements/layer at flagship shapes, twice (fwd + bwd
# regeneration) — measured ~2 ms/layer of pure mask arithmetic
# (exp/dropout_cost_probe.py).  The TPU's hardware PRNG generates the
# same Bernoulli mask in ~1 generate + 1 compare per element.
#
# Reproducibility contract: the PRNG is re-seeded every _HW_CHUNK rows
# of the block's batch axis with (seed, tag*MIX + absolute_chunk_index),
# so ANY blocking whose row count is a multiple of _HW_CHUNK regenerates
# the identical mask — the backward kernel (smaller batch block) agrees
# with the forward bit-for-bit.  NOT bit-compatible across kernel
# geometries (packed/wide/loop lay scores out differently) or across
# backends (interpret mode lacks the PRNG primitives and falls back to
# the hash) — the Bernoulli distribution is identical everywhere, only
# the sampled mask differs.  Runs that need one mask across geometries
# use dropout_impl="hash".

_HW_CHUNK = 8
_HW_TAG_MIX = np.int32(np.uint32(0x9E3779B1).view(np.int32))


def _hw_block(bb: int) -> int:
    """Round a batch block down to the _HW_CHUNK multiple the hw-PRNG
    mask contract requires (min one chunk; Pallas pads short blocks)."""
    return max(_HW_CHUNK, bb // _HW_CHUNK * _HW_CHUNK)


def _hw_keep(shape, p: float, seed, tag, row0, chunk: int = _HW_CHUNK):
    """Scaled keep-mask over ``shape`` (rows first) from the hardware
    PRNG — see the contract note above.  ``tag`` distinguishes
    same-row generates (head group / head index); ``row0`` is the
    block's first global row (a multiple of ``chunk``).  ``chunk`` is
    the re-seed granularity: the caller must pass the SAME value to the
    forward and backward kernels, each of whose block rows and row
    offsets are multiples of it (gcd of the two block sizes).  Bigger
    chunks amortize the per-generate reseed cost (a (8, F) generate is
    overhead-bound; a (256, F) one is not)."""
    rows = int(shape[0])
    assert rows % chunk == 0, (shape, chunk)
    thresh = np.uint32(int(p * (2**32)))
    chunk0 = row0.astype(jnp.int32) // np.int32(chunk)
    tagmix = jnp.asarray(tag, jnp.int32) * _HW_TAG_MIX
    parts = []
    for c in range(rows // chunk):
        pltpu.prng_seed(seed, tagmix + chunk0 + np.int32(c))
        parts.append(
            pltpu.bitcast(
                pltpu.prng_random_bits((chunk,) + tuple(shape[1:])),
                jnp.uint32,
            )
        )
    bits = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    keep = (bits >= thresh).astype(jnp.float32)
    return keep / (1.0 - p)


def _score_dtype():
    """Storage dtype for attention probabilities / keep-masks inside the
    packed kernels (softmax itself stays fp32).  bf16 halves the largest
    VMEM tensors, admitting bigger batch blocks (round-4 escape,
    docs/DESIGN.md).  TOSSCTR_ATTN_SCORE_DTYPE=bfloat16 opts in; the
    default stays fp32 (the oracle-exact mode the tests pin)."""
    return (
        jnp.bfloat16
        if os.environ.get("TOSSCTR_ATTN_SCORE_DTYPE", "float32") == "bfloat16"
        else jnp.float32
    )


def _score_bytes() -> int:
    return 2 if _score_dtype() == jnp.bfloat16 else 4


def _resolve_dropout_impl(dropout_impl: str, interpret: bool) -> str:
    """interpret mode (CPU tests / non-TPU backends) lacks the Mosaic
    PRNG primitives: fall back to the hash there.  fwd and bwd resolve
    identically, so the pair always agrees on the mask."""
    if dropout_impl == "hw" and interpret:
        return "hash"
    if dropout_impl not in ("hash", "hw"):
        raise ValueError(f"dropout_impl must be 'hash' or 'hw', got {dropout_impl!r}")
    return dropout_impl


def dropout_keep_reference(B: int, Kq: int, Kk: int, n_heads: int, p: float, seed: int):
    """Numpy oracle of the in-kernel mask -> (H, B, Kq, Kk) scaled keep."""
    r = np.arange(B, dtype=np.uint32)[None, :, None, None]
    qi = np.arange(Kq, dtype=np.uint32)[None, None, :, None]
    kj = np.arange(Kk, dtype=np.uint32)[None, None, None, :]
    h = np.arange(n_heads, dtype=np.uint32)[:, None, None, None]
    with np.errstate(over="ignore"):
        x = (
            r * _MIX_R + qi * _MIX_Q + kj * _MIX_K + h * _MIX_H
            + np.uint32(np.int64(seed) & 0xFFFFFFFF) * _MIX_S
        )
        x = x ^ (x >> np.uint32(16))
        x = x * _FMIX_C1
        x = x ^ (x >> np.uint32(15))
        x = x * _FMIX_C2
        x = x ^ (x >> np.uint32(16))
    keep = (x >= np.uint32(int(p * (2**32)))).astype(np.float32)
    return keep / (1.0 - p)


def _attn_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, *, H: int, dh: int,
    K: int, dropout_p: float, dropout_impl: str = "hash",
):
    i = pl.program_id(0)
    q = q_ref[...]  # (Bb, Kp, D), compute dtype (bf16 under amp)
    k = k_ref[...]
    v = v_ref[...]
    bias = bias_ref[...].astype(jnp.float32)  # (Kp, Kp)
    Bb, Kp, D = q.shape
    scale = 1.0 / np.sqrt(dh)
    # mask out padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, (Kp, Kp), 1)
    colmask = jnp.where(col < K, 0.0, -1e9)

    def head(h, o):
        qh = q * _head_mask(h, dh, D).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # (Bb, Kp, Kp)
        s = s + bias[None, :, :] + colmask[None, :, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout_p > 0.0:
            if dropout_impl == "hw":
                p = p * _hw_keep(p.shape, dropout_p, seed_ref[0], h, i * Bb)
            else:
                p = p * _dropout_keep(p.shape, dropout_p, seed_ref[0], h, i * Bb)
        vh = v * _head_mask(h, dh, D).astype(v.dtype)
        return o + jax.lax.dot_general(
            p.astype(v.dtype), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    o = jax.lax.fori_loop(0, H, head, jnp.zeros((Bb, Kp, D), jnp.float32))
    o_ref[...] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, *, H: int, dh: int, K: int,
    dropout_p: float, B_total: int, dropout_impl: str = "hash",
):
    i = pl.program_id(0)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    bias = bias_ref[...].astype(jnp.float32)
    do = do_ref[...]
    Bb, Kp, D = q.shape
    # zero out-of-range batch rows of the last block: their buffer
    # content is undefined and dbias sums over the batch dim
    row = jax.lax.broadcasted_iota(jnp.int32, (Bb, 1, 1), 0) + i * Bb
    valid = row < B_total  # where(), not *: garbage rows may hold inf/nan
    q = jnp.where(valid, q, 0.0)
    k = jnp.where(valid, k, 0.0)
    v = jnp.where(valid, v, 0.0)
    do = jnp.where(valid, do, 0.0)
    scale = 1.0 / np.sqrt(dh)
    col = jax.lax.broadcasted_iota(jnp.int32, (Kp, Kp), 1)
    colmask = jnp.where(col < K, 0.0, -1e9)
    def head(h, carry):
        dq, dk, dv, dbias = carry
        m = _head_mask(h, dh, D).astype(q.dtype)
        qh = q * m
        s = jax.lax.dot_general(
            qh, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias[None, :, :] + colmask[None, :, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout_p > 0.0:
            if dropout_impl == "hw":
                keep = _hw_keep(p.shape, dropout_p, seed_ref[0], h, i * Bb)
            else:
                keep = _dropout_keep(p.shape, dropout_p, seed_ref[0], h, i * Bb)
            pd = p * keep
        else:
            keep = None
            pd = p
        doh = do * m
        # dV (head dims only): P_d^T @ dO_h
        dv = dv + jax.lax.dot_general(
            pd.astype(q.dtype), doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # dP_d = dO_h @ V^T (full-D contraction; zeros outside head dims)
        dpd = jax.lax.dot_general(
            doh, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = dpd * keep if keep is not None else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias = dbias + jnp.sum(ds, axis=0)
        ds = (ds * scale).astype(q.dtype)
        # dQ_h = (dS @ K) masked to head dims
        dq = dq + jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * m.astype(jnp.float32)
        # dK_h = (dS^T @ Q_h)
        dk = dk + jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        return dq, dk, dv, dbias

    dq, dk, dv, dbias = jax.lax.fori_loop(
        0, H, head,
        (
            jnp.zeros((Bb, Kp, D), jnp.float32),
            jnp.zeros((Bb, Kp, D), jnp.float32),
            jnp.zeros((Bb, Kp, D), jnp.float32),
            jnp.zeros((Kp, Kp), jnp.float32),
        ),
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)

    # dbias accumulates across the sequential grid; the buffer is
    # uninitialized before the first write
    @pl.when(i == 0)
    def _():
        dbias_ref[...] = dbias

    @pl.when(i != 0)
    def _():
        dbias_ref[...] += dbias


def _group_mask4(g0, G: int, dh: int, D: int, dtype):
    """(1, G, 1, D) mask: dim slices of heads g0..g0+G-1 (g0 may be a
    traced loop index)."""
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1, D), 3)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1, D), 1) + g0
    return (d_idx // dh == h_idx).astype(dtype)


def _dropout_keep_packed(shape, p: float, seed, Kp: int, row0, head0):
    """Keep-mask for a packed (bb, G*Kp, Kp) score block, evaluating
    the SAME hash at the same absolute (row, q, k, head) coordinates as
    ``_dropout_keep`` — packed and loop kernels produce bit-identical
    masks (oracle: dropout_keep_reference)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0.astype(jnp.uint32)
    hq = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    head = hq // np.uint32(Kp) + head0.astype(jnp.uint32)
    qi = hq % np.uint32(Kp)
    kj = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    x = (
        r * _MIX_R + qi * _MIX_Q + kj * _MIX_K
        + head * _MIX_H + seed.astype(jnp.uint32) * _MIX_S
    )
    x = _fmix32(x)
    keep = (x >= np.uint32(int(p * (2**32)))).astype(jnp.float32)
    return keep / (1.0 - p)


def _packed_group_scores(q, k, bias_t, g0, G, dh, dropout_p, seed, row0,
                         dropout_impl="hash"):
    """Scores for heads g0..g0+G-1, packed into the matmul ROW dim:
    Qexp[b, g*Kp+q] = Q[b,q] ∘ m_{g0+g}, so S = Qexp K^T is ONE
    M=G*Kp matmul per batch row instead of G M=Kp matmuls.  With
    G*Kp = 128 the MXU sees exactly one full row pass (the per-head
    form fills only Kp of 128 rows).  Softmax stays a plain lane
    reduce — each packed row is one (head, query) pair.
    -> (P fp32, Pd = P*keep, keep or None), shapes (bb, G*Kp, Kp)."""
    bb, Kp, D = q.shape
    scale = 1.0 / np.sqrt(dh)
    m4 = _group_mask4(g0, G, dh, D, q.dtype)
    qexp = (q[:, None, :, :] * m4).reshape(bb, G * Kp, D)
    s = jax.lax.dot_general(
        qexp, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (bb, G*Kp, Kp)
    s = s + bias_t  # bias_t already carries the padded-key-column mask
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    sdt = _score_dtype()
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(sdt)
    if dropout_p > 0.0:
        if dropout_impl == "hw":
            keep = _hw_keep(p.shape, dropout_p, seed, g0, row0).astype(sdt)
        else:
            keep = _dropout_keep_packed(
                p.shape, dropout_p, seed, Kp, row0, g0 * jnp.int32(1)
            ).astype(sdt)
        return p, p * keep, keep
    return p, p, None


def _packed_bias(bias, colmask_row, G: int):
    """(1, G*Kp, Kp) fp32: head-shared bias tiled per packed head block
    plus the padded-key-column mask."""
    Kp = bias.shape[0]
    bias_t = jnp.broadcast_to(
        bias[None, :, :].astype(jnp.float32), (G, Kp, Kp)
    ).reshape(1, G * Kp, Kp)
    return bias_t + colmask_row


def _packed_attend_fwd(q, k, v, bias_t, seed, row0, *, H, dh, G, dropout_p,
                       dropout_impl="hash"):
    """Packed-group attention forward core -> o (bb, Kp, D) fp32."""
    bb, Kp, D = q.shape

    def group(g, o):
        g0 = g * G
        _, pd, _ = _packed_group_scores(
            q, k, bias_t, g0, G, dh, dropout_p, seed, row0, dropout_impl
        )
        o_exp = jax.lax.dot_general(
            pd.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, G*Kp, D)
        m4 = _group_mask4(g0, G, dh, D, jnp.float32)
        return o + jnp.sum(o_exp.reshape(bb, G, Kp, D) * m4, axis=1)

    return jax.lax.fori_loop(0, H // G, group, jnp.zeros((bb, Kp, D), jnp.float32))


def _attn_fwd_kernel_packed(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, *, H: int, dh: int,
    K: int, G: int, dropout_p: float, wide: bool = False,
    dropout_impl: str = "hash",
):
    i = pl.program_id(0)
    q = q_ref[...]
    bb, Kp, D = q.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
    colmask = jnp.where(col < K, 0.0, -1e9)
    if wide:
        bias_w = _wide_bias(bias_ref[...], colmask, H)
        o = _wide_attend_fwd(
            q, k_ref[...], v_ref[...], bias_w, seed_ref[0], i * bb,
            H=H, dh=dh, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    else:
        bias_t = _packed_bias(bias_ref[...], colmask, G)
        o = _packed_attend_fwd(
            q, k_ref[...], v_ref[...], bias_t, seed_ref[0], i * bb,
            H=H, dh=dh, G=G, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    o_ref[...] = o.astype(o_ref.dtype)


def _packed_attend_bwd(q, k, v, do, bias_t, seed, row0, *, H, dh, G,
                       dropout_p, dropout_impl="hash"):
    """Packed-group attention backward core
    -> (dq, dk, dv (bb, Kp, D) fp32, dbias (Kp, Kp) fp32)."""
    bb, Kp, D = q.shape
    scale = 1.0 / np.sqrt(dh)

    def group(g, carry):
        dq, dk, dv, dbias = carry
        g0 = g * G
        p, pd, keep = _packed_group_scores(
            q, k, bias_t, g0, G, dh, dropout_p, seed, row0, dropout_impl
        )
        m4 = _group_mask4(g0, G, dh, D, do.dtype)
        doexp = (do[:, None, :, :] * m4).reshape(bb, G * Kp, D)
        # dV += Pd^T dOexp (contract packed rows: K = G*Kp deep)
        dv = dv + jax.lax.dot_general(
            pd.astype(do.dtype), doexp, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doexp, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias = dbias + jnp.sum(ds.reshape(bb, G, Kp, Kp), axis=(0, 1))
        ds = (ds * scale).astype(q.dtype)
        qexp = (q[:, None, :, :] * _group_mask4(g0, G, dh, D, q.dtype)
                ).reshape(bb, G * Kp, D)
        # dK += dS^T Qexp (contract packed rows)
        dk = dk + jax.lax.dot_general(
            ds, qexp, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_exp = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, G*Kp, D)
        dq = dq + jnp.sum(
            dq_exp.reshape(bb, G, Kp, D) * _group_mask4(g0, G, dh, D, jnp.float32),
            axis=1,
        )
        return dq, dk, dv, dbias

    return jax.lax.fori_loop(
        0, H // G, group,
        (
            jnp.zeros((bb, Kp, D), jnp.float32),
            jnp.zeros((bb, Kp, D), jnp.float32),
            jnp.zeros((bb, Kp, D), jnp.float32),
            jnp.zeros((Kp, Kp), jnp.float32),
        ),
    )


def _attn_bwd_kernel_packed(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref, *, H: int, dh: int, K: int, G: int,
    dropout_p: float, B_total: int, wide: bool = False,
    dropout_impl: str = "hash",
):
    i = pl.program_id(0)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    bb, Kp, D = q.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, 1, 1), 0) + i * bb
    valid = row < B_total
    q = jnp.where(valid, q, 0.0)
    k = jnp.where(valid, k, 0.0)
    v = jnp.where(valid, v, 0.0)
    do = jnp.where(valid, do, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
    colmask = jnp.where(col < K, 0.0, -1e9)
    if wide:
        bias_w = _wide_bias(bias_ref[...], colmask, H)
        dq, dk, dv, dbias = _wide_attend_bwd(
            q, k, v, do, bias_w, seed_ref[0], i * bb,
            H=H, dh=dh, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    else:
        bias_t = _packed_bias(bias_ref[...], colmask, G)
        dq, dk, dv, dbias = _packed_attend_bwd(
            q, k, v, do, bias_t, seed_ref[0], i * bb,
            H=H, dh=dh, G=G, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = dbias

    @pl.when(i != 0)
    def _():
        dbias_ref[...] += dbias


# ---------------------------------------------------------------------------
# "wide" geometry: instead of packing G heads into the matmul ROW dim
# (4 group iterations x 2 matmuls of (G*Kp, D)@(D, Kp) per batch row),
# pack ALL heads into the matmul COLUMN dim via head-masked hat tensors:
#   khat[(h,j), d] = K[j, d] * m_h[d]   (bb, H*Kp, D) — no transpose
#   S = Q @ khat^T  — ONE (Kp, D)x(D, H*Kp) dot per row (N=H*Kp wide)
#   O = P @ vhat    — ONE (Kp, H*Kp)x(H*Kp, D) dot per row (K deep)
# Same math as the packed core (head-masked full-D contractions), half
# the MXU row-passes at D=64/H=8/Kp=64.  Dropout uses the identical
# absolute-coordinate hash, so all three impls are bit-compatible.
# ---------------------------------------------------------------------------


def _hat(t, H: int, dh: int):
    """(bb, Kp, D) -> head-masked (bb, H*Kp, D).  Rank-3 only (Mosaic
    rejects 4-D shape casts): one masked copy per head, concatenated
    along the packed row dim."""
    bb, Kp, D = t.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    parts = []
    for h in range(H):
        m = ((d_idx >= h * dh) & (d_idx < (h + 1) * dh)).astype(t.dtype)
        parts.append(t * m)
    return jnp.concatenate(parts, axis=1)


def _wide_bias(bias, colmask_row, H: int):
    """(1, Kp, H*Kp) fp32: head-shared bias + padded-key-column mask,
    tiled per head along the packed COLUMN dim."""
    b2 = bias[None, :, :].astype(jnp.float32) + colmask_row
    return jnp.concatenate([b2] * H, axis=2)


def _dropout_keep_wide(shape, p: float, seed, Kp: int, row0):
    """Keep-mask for a (bb, Kp, H*Kp) wide score block — same absolute
    (row, q, k, head) hash as _dropout_keep/_dropout_keep_packed."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0.astype(jnp.uint32)
    qi = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    hk = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    head = hk // np.uint32(Kp)
    kj = hk % np.uint32(Kp)
    x = (
        r * _MIX_R + qi * _MIX_Q + kj * _MIX_K
        + head * _MIX_H + seed.astype(jnp.uint32) * _MIX_S
    )
    x = _fmix32(x)
    keep = (x >= np.uint32(int(p * (2**32)))).astype(jnp.float32)
    return keep / (1.0 - p)


def _block_softmax(s, H: int, Kp: int):
    """Per-head-block softmax over the last dim of (bb, Kp, H*Kp),
    rank-3 only: static lane slices per head."""
    parts = []
    for h in range(H):
        blk = jax.lax.slice_in_dim(s, h * Kp, (h + 1) * Kp, axis=2)
        blk = blk - jnp.max(blk, axis=-1, keepdims=True)
        e = jnp.exp(blk)
        parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return jnp.concatenate(parts, axis=2)


def _wide_scores(q, khat, bias_w, *, H, dh, dropout_p, seed, row0,
                 dropout_impl="hash"):
    """-> (P fp32, Pd, keep or None), shapes (bb, Kp, H*Kp)."""
    bb, Kp, D = q.shape
    scale = 1.0 / np.sqrt(dh)
    s = jax.lax.dot_general(
        q, khat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (bb, Kp, H*Kp)
    s = s + bias_w
    p = _block_softmax(s, H, Kp)
    if dropout_p > 0.0:
        if dropout_impl == "hw":
            keep = _hw_keep(p.shape, dropout_p, seed, jnp.int32(0), row0)
        else:
            keep = _dropout_keep_wide(p.shape, dropout_p, seed, Kp, row0)
        return p, p * keep, keep
    return p, p, None


def _unhat(that, H: int, Kp: int, dh: int):
    """(bb, H*Kp, D) -> (bb, Kp, D): fold each head block back onto its
    dim slice and sum (rank-3: static sublane slices per head)."""
    bb, HKp, D = that.shape
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    out = None
    for h in range(H):
        m = ((d_idx >= h * dh) & (d_idx < (h + 1) * dh)).astype(that.dtype)
        blk = jax.lax.slice_in_dim(that, h * Kp, (h + 1) * Kp, axis=1) * m
        out = blk if out is None else out + blk
    return out


def _wide_attend_fwd(q, k, v, bias_w, seed, row0, *, H, dh, dropout_p,
                     dropout_impl="hash"):
    """Wide attention forward core -> o (bb, Kp, D) fp32."""
    khat = _hat(k, H, dh)
    vhat = _hat(v, H, dh)
    _, pd, _ = _wide_scores(
        q, khat, bias_w, H=H, dh=dh, dropout_p=dropout_p, seed=seed,
        row0=row0, dropout_impl=dropout_impl,
    )
    return jax.lax.dot_general(
        pd.astype(v.dtype), vhat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, Kp, D)


def _wide_attend_bwd(q, k, v, do, bias_w, seed, row0, *, H, dh, dropout_p,
                     dropout_impl="hash"):
    """-> (dq, dk, dv (bb, Kp, D) fp32, dbias (Kp, Kp) fp32)."""
    bb, Kp, D = q.shape
    scale = 1.0 / np.sqrt(dh)
    khat = _hat(k, H, dh)
    vhat = _hat(v, H, dh)
    p, pd, keep = _wide_scores(
        q, khat, bias_w, H=H, dh=dh, dropout_p=dropout_p, seed=seed,
        row0=row0, dropout_impl=dropout_impl,
    )
    # dVhat = Pd^T dO, then fold head blocks back onto their dim slices
    dvhat = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bb, H*Kp, D)
    dv = _unhat(dvhat, H, Kp, dh)
    dp = jax.lax.dot_general(
        do, vhat, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (bb, Kp, H*Kp)
    if keep is not None:
        dp = dp * keep
    # softmax backward + dbias per head block (rank-3 lane slices)
    ds_parts = []
    dbias = jnp.zeros((Kp, Kp), jnp.float32)
    for h in range(H):
        p_h = jax.lax.slice_in_dim(p, h * Kp, (h + 1) * Kp, axis=2)
        dp_h = jax.lax.slice_in_dim(dp, h * Kp, (h + 1) * Kp, axis=2)
        ds_h = p_h * (dp_h - jnp.sum(dp_h * p_h, axis=-1, keepdims=True))
        dbias = dbias + jnp.sum(ds_h, axis=0)  # pre-scale (packed parity)
        ds_parts.append(ds_h)
    ds = (jnp.concatenate(ds_parts, axis=2) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, khat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (bb, Kp, D) — head masks live inside khat
    dkhat = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (bb, H*Kp, D)
    dk = _unhat(dkhat, H, Kp, dh)
    return dq, dk, dv, dbias


def _qkv_project(x, wq, wk, wv, bq, bk, bv):
    """In-kernel q/k/v projection: (bb, Kp, D) @ (D, D) + bias per
    stream, computed as one M=bb*Kp MXU dot each.  NOTE: rows of x that
    are zero (K padding / batch padding) project to the BIAS value, not
    zero — callers mask afterwards where that matters."""
    bb, Kp, D = x.shape
    x2 = x.reshape(bb * Kp, D)

    def proj(w, b):
        y = jax.lax.dot_general(
            x2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + b).astype(x.dtype).reshape(bb, Kp, D)

    return proj(wq, bq), proj(wk, bk), proj(wv, bv)


def _attn_fwd_kernel_packed_qkv(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    bias_ref, seed_ref, o_ref, *, H: int, dh: int, K: int, G: int,
    dropout_p: float, wide: bool = False, dropout_impl: str = "hash",
):
    """Fused qkv-projection + packed/wide attention: the (B, K, 3D) qkv
    tensor never exists in HBM (the 3-D XLA form spent ~4.6 ms/layer
    on relayout copies around the bias add; a 2-D XLA form was worse —
    see models/layers.py note)."""
    i = pl.program_id(0)
    x = x_ref[...]
    bb, Kp, D = x.shape
    q, k, v = _qkv_project(
        x, wq_ref[...], wk_ref[...], wv_ref[...],
        bq_ref[...], bk_ref[...], bv_ref[...],
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
    colmask = jnp.where(col < K, 0.0, -1e9)
    if wide:
        bias_w = _wide_bias(bias_ref[...], colmask, H)
        o = _wide_attend_fwd(
            q, k, v, bias_w, seed_ref[0], i * bb,
            H=H, dh=dh, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    else:
        bias_t = _packed_bias(bias_ref[...], colmask, G)
        o = _packed_attend_fwd(
            q, k, v, bias_t, seed_ref[0], i * bb,
            H=H, dh=dh, G=G, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    o_ref[...] = o.astype(o_ref.dtype)


def _attn_bwd_kernel_packed_qkv(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    bias_ref, seed_ref, do_ref,
    dx_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
    dbias_ref, *, H: int, dh: int, K: int, G: int,
    dropout_p: float, B_total: int, wide: bool = False,
    dropout_impl: str = "hash",
):
    """Backward of the qkv-fused forward: recomputes q/k/v from x (one
    extra tiny dot per stream), runs the packed attention backward,
    then folds dq/dk/dv through the projection — dX in-kernel, dW/db
    accumulated across the sequential grid like dbias.

    Padding correctness: zero rows of x project to the bias value, but
    every such row's cotangent is zero (K-pad query rows have zero dO;
    K-pad key/value columns are -1e9-masked; batch-pad rows are zeroed
    here), so dq/dk/dv vanish at pad rows and dW/db see no padding
    contribution."""
    i = pl.program_id(0)
    x = x_ref[...]
    do = do_ref[...]
    bb, Kp, D = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, 1, 1), 0) + i * bb
    valid = row < B_total
    do = jnp.where(valid, do, 0.0)
    x = jnp.where(valid, x, 0.0)
    q, k, v = _qkv_project(
        x, wq_ref[...], wk_ref[...], wv_ref[...],
        bq_ref[...], bk_ref[...], bv_ref[...],
    )
    # batch-pad rows projected to the bias value: zero them so the
    # attend core sees exactly what the unfused bwd kernel sees
    q = jnp.where(valid, q, 0.0)
    k = jnp.where(valid, k, 0.0)
    v = jnp.where(valid, v, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
    colmask = jnp.where(col < K, 0.0, -1e9)
    if wide:
        bias_w = _wide_bias(bias_ref[...], colmask, H)
        dq, dk, dv, dbias = _wide_attend_bwd(
            q, k, v, do, bias_w, seed_ref[0], i * bb,
            H=H, dh=dh, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    else:
        bias_t = _packed_bias(bias_ref[...], colmask, G)
        dq, dk, dv, dbias = _packed_attend_bwd(
            q, k, v, do, bias_t, seed_ref[0], i * bb,
            H=H, dh=dh, G=G, dropout_p=dropout_p, dropout_impl=dropout_impl,
        )
    x2 = x.reshape(bb * Kp, D)
    dx = jnp.zeros((bb * Kp, D), jnp.float32)
    for dt, w_ref, dw_ref, db_ref in (
        (dq, wq_ref, dwq_ref, dbq_ref),
        (dk, wk_ref, dwk_ref, dbk_ref),
        (dv, wv_ref, dwv_ref, dbv_ref),
    ):
        dt2 = dt.astype(x.dtype).reshape(bb * Kp, D)
        dx = dx + jax.lax.dot_general(
            dt2, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw = jax.lax.dot_general(
            x2, dt2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, D)
        db = jnp.sum(dt, axis=(0, 1), keepdims=False).reshape(1, D)

        @pl.when(i == 0)
        def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
            dw_ref[...] = dw
            db_ref[...] = db

        @pl.when(i != 0)
        def _(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
            dw_ref[...] += dw
            db_ref[...] += db

    dx_ref[...] = dx.reshape(bb, Kp, D).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = dbias

    @pl.when(i != 0)
    def _():
        dbias_ref[...] += dbias


def _head_group(H: int, Kp: int) -> int:
    """Largest divisor G of H with G*Kp <= 128 (one full MXU row pass);
    1 when Kp > 128."""
    best = 1
    for g in range(1, H + 1):
        if H % g == 0 and g * Kp <= 128:
            best = g
    return best


def _bwd_block_div() -> int:
    """Backward batch-block divisor (default 2: the bwd carries extra
    fp32 accumulators on top of the fwd working set).  Override with
    TOSSCTR_ATTN_BWD_BLOCK_DIV to probe the VMEM ceiling."""
    return int(os.environ.get("TOSSCTR_ATTN_BWD_BLOCK_DIV", "2"))


def _score_budget_bytes() -> int:
    """Per-score-tensor VMEM budget, sized against the Mosaic VMEM
    limit every pallas_call in this package raises per-kernel
    (ops/_vmem.py — pltpu.CompilerParams(vmem_limit_bytes=...); the
    global --xla_tpu_scoped_vmem_limit_kib flag is rejected by some
    backends, which is what capped round 2 at bb=32).  Default 4 MB
    -> bb_fwd=128 / bb_bwd=64 at G*Kp=128, Kp=64: the measured optimum
    of the {1,2,4,8} MB x {div 1,2} sweep on v5e (fwd+bwd 12.65 ->
    11.50 ms/layer, exp/attn_budget_probe.py); 8 MB (bb=256) is slower
    and its bwd fails to compile even at a 100 MB limit."""
    mb = os.environ.get("TOSSCTR_ATTN_SCORE_BUDGET_MB")
    if mb:
        return int(float(mb) * 1024 * 1024)
    # the 4 MB default presumes the per-kernel VMEM raise (ops/_vmem.py)
    # is active; with it disabled (TOSSCTR_PALLAS_VMEM_MB=0) Mosaic's
    # 16 MB default is back in force and bb=128 would be rejected at
    # compile (16.82 MB scoped was refused at bb=64 in round 2) — fall
    # back to the pre-raise 1 MB budget so the kernels still compile.
    if kernel_compiler_params() is None:
        return 1 * 1024 * 1024
    return 4 * 1024 * 1024


def _adaptive_block_packed(block_b: int, B: int, Kp: int, G: int) -> int:
    """Packed-group working set scales with G*Kp^2 fp32 per batch row;
    size the block so one (bb, G*Kp, Kp) score tensor stays within
    the budget (several are live at once)."""
    cap = max(
        8,
        (_score_budget_bytes() // max(1, G * Kp * Kp * _score_bytes())) // 8 * 8,
    )
    return max(1, min(block_b, B, cap))


def _pad_kdim(x, Kp):
    K = x.shape[1]
    if K == Kp:
        return x
    return jnp.pad(x, ((0, 0), (0, Kp - K), (0, 0)))


def _adaptive_block(block_b: int, B: int, Kp: int) -> int:
    """Per-head working set scales with Kp^2; shrink the batch block so
    the (bb, Kp, Kp) softmax tensors stay inside scoped VMEM."""
    cap = max(8, (2048 * 64 // max(Kp, 1) // Kp) // 8 * 8)
    return max(1, min(block_b, B, cap))


def _fwd_call(q, k, v, bias, seed, *, H, dropout_p, block_b, interpret,
              impl="loop", dropout_impl="hash"):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    B, K, D = q.shape
    dh = D // H
    Kp = _round_up(K, 8)
    if impl == "packed":
        G = _head_group(H, Kp)
        bb = _adaptive_block_packed(block_b, B, Kp, G)
        kern = functools.partial(_attn_fwd_kernel_packed, G=G)
    elif impl == "wide":
        bb = _adaptive_block_wide(block_b, B, Kp, H)
        kern = functools.partial(
            _attn_fwd_kernel_packed, G=_head_group(H, Kp), wide=True
        )
    else:
        bb = _adaptive_block(block_b, B, Kp)
        kern = _attn_fwd_kernel
    if dropout_impl == "hw":
        bb = _hw_block(bb)
    qp, kp, vp = _pad_kdim(q, Kp), _pad_kdim(k, Kp), _pad_kdim(v, Kp)
    biasp = jnp.pad(bias, ((0, Kp - K), (0, Kp - K)))
    grid = (_cdiv(B, bb),)
    out = pl.pallas_call(
        functools.partial(
            kern, H=H, dh=dh, K=K, dropout_p=float(dropout_p),
            dropout_impl=dropout_impl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, D), q.dtype),
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(qp, kp, vp, biasp, seed)
    return out[:, :K, :]


def _bwd_call(q, k, v, bias, seed, do, *, H, dropout_p, block_b, interpret,
              impl="loop", dropout_impl="hash"):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    B, K, D = q.shape
    dh = D // H
    Kp = _round_up(K, 8)
    # backward carries extra fp32 accumulators on top of the fwd
    # working set; halve the block to stay inside scoped VMEM
    if impl == "packed":
        G = _head_group(H, Kp)
        bb = max(1, _adaptive_block_packed(block_b, B, Kp, G) // _bwd_block_div())
        kern = functools.partial(_attn_bwd_kernel_packed, G=G)
    elif impl == "wide":
        bb = max(1, _adaptive_block_wide(block_b, B, Kp, H) // 2)
        kern = functools.partial(
            _attn_bwd_kernel_packed, G=_head_group(H, Kp), wide=True
        )
    else:
        bb = max(1, _adaptive_block(block_b, B, Kp) // 2)
        kern = _attn_bwd_kernel
    if dropout_impl == "hw":
        bb = _hw_block(bb)
    qp, kp, vp = _pad_kdim(q, Kp), _pad_kdim(k, Kp), _pad_kdim(v, Kp)
    dop = _pad_kdim(do, Kp)
    biasp = jnp.pad(bias, ((0, Kp - K), (0, Kp - K)))
    grid = (_cdiv(B, bb),)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(
            kern, H=H, dh=dh, K=K, dropout_p=float(dropout_p),
            B_total=B, dropout_impl=dropout_impl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Kp, D), q.dtype),
            jax.ShapeDtypeStruct((B, Kp, D), q.dtype),
            jax.ShapeDtypeStruct((B, Kp, D), q.dtype),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(qp, kp, vp, biasp, seed, dop)
    return dq[:, :K], dk[:, :K], dv[:, :K], dbias[:K, :K].astype(bias.dtype)


def _split_qkv_params(wqkv, bqkv, D):
    """(D, 3D) kernel / (3D,) bias -> per-stream (D, D) and (1, D) f32
    pieces (tiny XLA slices outside the kernel — in-kernel lane slicing
    at 64-offsets would relayout)."""
    wq, wk, wv = wqkv[:, :D], wqkv[:, D:2 * D], wqkv[:, 2 * D:]
    b = bqkv.astype(jnp.float32).reshape(1, 3 * D)
    return wq, wk, wv, b[:, :D], b[:, D:2 * D], b[:, 2 * D:]


def _adaptive_block_wide(block_b: int, B: int, Kp: int, H: int) -> int:
    """Wide working set: one (bb, Kp, H*Kp) fp32 score tensor per live
    intermediate — size the block to the same per-tensor budget."""
    cap = max(8, (_score_budget_bytes() // max(1, Kp * H * Kp * 4)) // 8 * 8)
    return max(1, min(block_b, B, cap))


def _fwd_call_qkv(x, wqkv, bqkv, bias, seed, *, H, dropout_p, block_b,
                  interpret, impl="packed", dropout_impl="hash"):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    B, K, D = x.shape
    dh = D // H
    Kp = _round_up(K, 8)
    G = _head_group(H, Kp)
    wide = impl == "wide"
    bb = (
        _adaptive_block_wide(block_b, B, Kp, H)
        if wide
        else _adaptive_block_packed(block_b, B, Kp, G)
    )
    if dropout_impl == "hw":
        bb = _hw_block(bb)
    xp = _pad_kdim(x, Kp)
    biasp = jnp.pad(bias, ((0, Kp - K), (0, Kp - K)))
    wq, wk, wv, bq, bk, bv = _split_qkv_params(wqkv, bqkv, D)
    grid = (_cdiv(B, bb),)
    w_spec = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_fwd_kernel_packed_qkv, H=H, dh=dh, K=K, G=G,
            dropout_p=float(dropout_p), wide=wide, dropout_impl=dropout_impl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec, b_spec, b_spec, b_spec,
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, D), x.dtype),
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, wq, wk, wv, bq, bk, bv, biasp, seed)
    return out[:, :K, :]


def _bwd_call_qkv(x, wqkv, bqkv, bias, seed, do, *, H, dropout_p, block_b,
                  interpret, impl="packed", dropout_impl="hash"):
    interpret = _resolve_interpret(interpret)
    dropout_impl = _resolve_dropout_impl(dropout_impl, interpret)
    B, K, D = x.shape
    dh = D // H
    Kp = _round_up(K, 8)
    G = _head_group(H, Kp)
    wide = impl == "wide"
    bb = max(
        1,
        (
            _adaptive_block_wide(block_b, B, Kp, H)
            if wide
            else _adaptive_block_packed(block_b, B, Kp, G)
        ) // _bwd_block_div(),
    )
    if dropout_impl == "hw":
        bb = _hw_block(bb)
    xp = _pad_kdim(x, Kp)
    dop = _pad_kdim(do, Kp)
    biasp = jnp.pad(bias, ((0, Kp - K), (0, Kp - K)))
    wq, wk, wv, bq, bk, bv = _split_qkv_params(wqkv, bqkv, D)
    grid = (_cdiv(B, bb),)
    w_spec = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dwq, dwk, dwv, dbq, dbk, dbv, dbias = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel_packed_qkv, H=H, dh=dh, K=K, G=G,
            dropout_p=float(dropout_p), B_total=B, wide=wide,
            dropout_impl=dropout_impl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec, b_spec, b_spec, b_spec,
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, Kp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            w_spec, w_spec, w_spec, b_spec, b_spec, b_spec,
            pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Kp, D), x.dtype),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, wq, wk, wv, bq, bk, bv, biasp, seed, dop)
    dwqkv = jnp.concatenate([dwq, dwk, dwv], axis=1).astype(wqkv.dtype)
    dbqkv = jnp.concatenate(
        [dbq[0], dbk[0], dbv[0]], axis=0
    ).astype(bqkv.dtype)
    return (
        dx[:, :K],
        dwqkv,
        dbqkv,
        dbias[:K, :K].astype(bias.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_mha_qkv(x, wqkv, bqkv, bias, seed, n_heads: int,
                  dropout_p: float = 0.0, block_b: int = 64,
                  interpret: bool = False, impl: str = "packed",
                  dropout_impl: str = "hash"):
    """Fused qkv-projection + multi-head attention.

    x (B, K, D); wqkv (D, 3D); bqkv (3D,); bias (K, K) head-shared;
    seed int32 (1,).  Equivalent to Dense(3D)(x) -> split -> fused_mha
    with the packed kernel, but the (B, K, 3D) qkv tensor never exists
    in HBM and none of the split/bias relayout copies are emitted
    (~4.6 ms/layer measured at B=8192).  Gradients flow to x, wqkv,
    bqkv and bias; dW/db accumulate across the sequential batch grid
    in fp32.

    ``impl``: "packed" (heads in the matmul row dim) or "wide" (heads
    in the matmul column dim via head-masked hat tensors — ONE S and
    ONE O dot per batch row, half the MXU row-passes at D=64/H=8).

    ``dropout_impl``: "hash" (counter-based, numpy-reproducible,
    bit-identical across geometries) or "hw" (hardware PRNG, ~2 VPU
    ops/element instead of ~15 — see the contract note at _hw_keep)."""
    return _fwd_call_qkv(
        x, wqkv, bqkv, bias, seed, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )


def _fused_mha_qkv_fwd(x, wqkv, bqkv, bias, seed, n_heads, dropout_p,
                       block_b, interpret, impl, dropout_impl):
    out = _fwd_call_qkv(
        x, wqkv, bqkv, bias, seed, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )
    return out, (x, wqkv, bqkv, bias, seed)


def _fused_mha_qkv_bwd(n_heads, dropout_p, block_b, interpret, impl,
                       dropout_impl, res, g):
    x, wqkv, bqkv, bias, seed = res
    dx, dwqkv, dbqkv, dbias = _bwd_call_qkv(
        x, wqkv, bqkv, bias, seed, g, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )
    return dx, dwqkv, dbqkv, dbias, jnp.zeros_like(seed)


fused_mha_qkv.defvjp(_fused_mha_qkv_fwd, _fused_mha_qkv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_mha(q, k, v, bias, seed, n_heads: int, dropout_p: float = 0.0,
              block_b: int = 64, interpret: bool = False,
              impl: str = "packed", dropout_impl: str = "hash"):
    """softmax((QK^T)/sqrt(dh) + bias) V for all heads, fused.

    q/k/v: (B, K, D) packed head-major (D = n_heads * dh); bias (K, K)
    shared across heads/batch; seed: int32 array (1,) for attention
    dropout (ignored when dropout_p == 0).  Returns (B, K, D).

    ``impl``: "packed" (default) packs heads into the matmul row dim —
    ONE M=H*K dot per batch row instead of H M=K dots, ~4x the MXU row
    occupancy at D=64; "loop" is the round-1 per-head fori_loop kernel
    (kept as the second oracle).  Both produce bit-identical dropout
    masks (same absolute-coordinate hash) under dropout_impl="hash";
    "hw" swaps in the hardware-PRNG mask (see _hw_keep).
    """
    return _fwd_call(
        q, k, v, bias, seed, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )


def _fused_mha_fwd(q, k, v, bias, seed, n_heads, dropout_p, block_b,
                   interpret, impl, dropout_impl):
    out = _fwd_call(
        q, k, v, bias, seed, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )
    return out, (q, k, v, bias, seed)


def _fused_mha_bwd(n_heads, dropout_p, block_b, interpret, impl,
                   dropout_impl, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv, dbias = _bwd_call(
        q, k, v, bias, seed, g, H=n_heads, dropout_p=dropout_p,
        block_b=block_b, interpret=interpret, impl=impl,
        dropout_impl=dropout_impl,
    )
    return dq, dk, dv, dbias, jnp.zeros_like(seed)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def mha_reference(q, k, v, bias, n_heads: int):
    """jnp oracle (no dropout): same math as models.layers MHA core."""
    B, K, D = q.shape
    dh = D // n_heads

    def heads(t):
        return t.reshape(B, K, n_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
    logits = logits + bias[None, None]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, K, D)
