"""Final-partial-batch parity (VERDICT r3 #9).

The reference trains on the last partial batch (torch DataLoader
default drop_last=False, src/train.py:106-110).  Our static-shape step
pads it to batch_size and masks the padded rows — the loss and
gradients must equal a hypothetical smaller-batch step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tossctr_tpu.train.loss import bce_wll_style, logit_l2, pairwise_auc_loss


def test_masked_loss_equals_truncated():
    rng = np.random.default_rng(0)
    B, n_real = 32, 19
    z = jnp.asarray(rng.normal(0, 1, B).astype(np.float32))
    y = jnp.asarray((rng.random(B) < 0.3).astype(np.float32))
    valid = jnp.asarray((np.arange(B) < n_real).astype(np.float32))
    got = bce_wll_style(z, y, valid=valid)
    want = bce_wll_style(z[:n_real], y[:n_real])
    assert np.allclose(float(got), float(want), atol=1e-7)


def test_masked_pairwise_excludes_padded():
    rng = np.random.default_rng(1)
    B, n_real = 64, 40
    z = rng.normal(0, 1, B).astype(np.float32)
    y = (rng.random(B) < 0.4).astype(np.float32)
    # padded rows: extreme logits that would dominate hard-neg top-k
    z[n_real:] = 50.0
    y[n_real:] = 0.0
    valid = (np.arange(B) < n_real).astype(np.float32)
    key = jax.random.PRNGKey(0)
    got = pairwise_auc_loss(
        jnp.asarray(z), jnp.asarray(y), key, num_neg_per_pos=4,
        hard_frac=0.5, valid=jnp.asarray(valid),
    )
    # padded rows must not be selectable as hard negatives: with them
    # masked, every pair margin involves only real rows' logits
    assert np.isfinite(float(got))
    z2 = z.copy()
    z2[n_real:] = -50.0  # changing PADDED logits must not change the loss
    got2 = pairwise_auc_loss(
        jnp.asarray(z2), jnp.asarray(y), key, num_neg_per_pos=4,
        hard_frac=0.5, valid=jnp.asarray(valid),
    )
    assert np.allclose(float(got), float(got2), atol=1e-7)


def test_logit_l2_masked_in_total_loss():
    # masked mean of z^2 over real rows only (trainer total_loss form)
    z = jnp.asarray(np.array([1.0, 2.0, 100.0], np.float32))
    valid = jnp.asarray(np.array([1.0, 1.0, 0.0], np.float32))
    v = valid.astype(jnp.float32)
    zz = z.astype(jnp.float32) ** 2
    got = jnp.sum(zz * v) / jnp.maximum(jnp.sum(v), 1.0)
    assert np.allclose(float(got), (1.0 + 4.0) / 2.0)
    assert np.allclose(float(logit_l2(z[:2])), 2.5)


def test_loader_yields_partial_batch_and_steps_match_reference():
    """steps/epoch == ceil(n/B) (torch DataLoader drop_last=False)."""
    from tossctr_tpu.data.loader import BatchIterator

    class FakeCache:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def gather(self, idx, train=True):
            return {"y": np.zeros(len(idx), np.float32),
                    "row": idx.astype(np.int64)}

    n, B = 103, 16
    it = BatchIterator(FakeCache(n), batch_size=B, train=True, shuffle=False,
                       drop_last=False)
    assert len(it) == -(-n // B) == 7
    batches = list(it)
    assert len(batches) == 7
    last = batches[-1]
    assert last["row"].shape == (B,)
    assert last["valid"].sum() == n - 6 * B
    # padded rows repeat the final real row
    assert np.all(last["row"][int(last["valid"].sum()):] == last["row"][int(last["valid"].sum()) - 1])
    # default drop: exact batches only
    it2 = BatchIterator(FakeCache(n), batch_size=B, train=True, shuffle=False,
                        drop_last=True)
    assert len(it2) == n // B == 6
