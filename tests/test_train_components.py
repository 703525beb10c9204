import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tossctr_tpu.train.ema import (
    decay_at,
    ema_params,
    init_ema,
    make_ema_mask,
    update_ema,
)
from tossctr_tpu.train.loss import bce_wll_style, logit_l2, pairwise_auc_loss
from tossctr_tpu.train.sched import cosine_warmup_lr, make_lr_schedule


# ---- losses ----


def test_bce_wll_matches_reference_formula():
    rng = np.random.default_rng(0)
    z = rng.normal(0, 2, 256).astype(np.float32)
    y = (rng.random(256) < 0.2).astype(np.float32)
    got = float(bce_wll_style(jnp.asarray(z), jnp.asarray(y)))
    sp = np.logaddexp(0, -z[y > 0.5]).mean()
    sn = np.logaddexp(0, z[y <= 0.5]).mean()
    assert abs(got - 0.5 * (sp + sn)) < 1e-5


def test_bce_wll_empty_class_is_zero_side():
    z = jnp.asarray([1.0, -2.0, 0.5])
    y_allneg = jnp.zeros(3)
    got = float(bce_wll_style(z, y_allneg))
    want = 0.5 * float(np.logaddexp(0, np.asarray(z)).mean())
    assert abs(got - want) < 1e-6


def test_bce_wll_valid_mask():
    z = jnp.asarray([1.0, -2.0, 99.0, -99.0])
    y = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    v = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    got = float(bce_wll_style(z, y, valid=v))
    want = float(bce_wll_style(z[:2], y[:2]))
    assert abs(got - want) < 1e-6


def test_logit_l2():
    z = jnp.asarray([1.0, -3.0])
    assert abs(float(logit_l2(z)) - 5.0) < 1e-6


def test_pairwise_auc_loss_behaviour():
    rng = jax.random.PRNGKey(0)
    y = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    z_good = jnp.asarray([5.0, 4.0, -5.0, -4.0, -3.0, -6.0])
    z_bad = -z_good
    lg = float(pairwise_auc_loss(z_good, y, rng))
    lb = float(pairwise_auc_loss(z_bad, y, rng))
    assert lg < 0.05 < lb
    # degenerate: single class -> 0
    assert float(pairwise_auc_loss(z_good, jnp.zeros(6), rng)) == 0.0
    # hard negatives path runs and penalizes the bad ranking heavily
    lh = float(pairwise_auc_loss(z_bad, y, rng, hard_frac=0.5))
    assert np.isfinite(lh) and lh > 1.0


# ---- schedule ----


def test_cosine_warmup_matches_reference_scalar():
    spe, base, we, te = 100, 0.1, 2, 10
    for epoch in [0, 1, 2, 5, 9]:
        for step in [0, 50, 99]:
            lr = cosine_warmup_lr(epoch, step, spe, base, we, te)
            gstep = epoch * spe + step
            if gstep < we * spe:
                want = base * (gstep + 1) / (we * spe)
            else:
                import math

                prog = (gstep - we * spe) / (te * spe - we * spe)
                want = 0.5 * base * (1 + math.cos(math.pi * prog))
            assert abs(lr - want) < 1e-12


def test_schedule_fn_matches_scalar_reference():
    spe, base, we, te = 50, 3e-4, 1, 8
    sched = make_lr_schedule(base, warmup_steps=we * spe, total_steps=te * spe)
    for epoch in range(te):
        for step in [0, 10, 49]:
            g = epoch * spe + step
            want = cosine_warmup_lr(epoch, step, spe, base, we, te)
            assert abs(float(sched(g)) - want) < 1e-9, (epoch, step)


# ---- EMA ----


def _tiny_params():
    return {"a": jnp.asarray([1.0, 2.0]), "nested": {"b": jnp.asarray([[3.0]])}}


def test_ema_basic_lerp():
    p0 = _tiny_params()
    ema = init_ema(p0)
    p1 = jax.tree_util.tree_map(lambda x: x + 1.0, p0)
    ema = update_ema(ema, p1, jnp.asarray(1), base_decay=0.9)
    np.testing.assert_allclose(np.asarray(ema.shadow["a"]), [1.1, 2.1], rtol=1e-6)
    assert int(ema.num_updates) == 1


def test_ema_update_after_step_and_interval():
    p0 = _tiny_params()
    ema = init_ema(p0)
    p1 = jax.tree_util.tree_map(lambda x: x + 1.0, p0)
    # gated off: step < update_after_step
    e1 = update_ema(ema, p1, jnp.asarray(1), base_decay=0.9, update_after_step=5)
    np.testing.assert_allclose(np.asarray(e1.shadow["a"]), [1.0, 2.0])
    assert int(e1.num_updates) == 0
    # interval gating: step 3 with interval 2 (after=0) -> off
    e2 = update_ema(ema, p1, jnp.asarray(3), base_decay=0.9, update_interval=2)
    assert int(e2.num_updates) == 0
    e3 = update_ema(ema, p1, jnp.asarray(4), base_decay=0.9, update_interval=2)
    assert int(e3.num_updates) == 1


def test_ema_decay_warmup_schedules():
    n = jnp.asarray(0)
    assert float(decay_at(n, 0.999, 0, "linear")) == pytest.approx(0.999)
    # linear: first update with warmup 10 -> 1-(1-d)*0.1
    assert float(decay_at(n, 0.9, 10, "linear")) == pytest.approx(1 - 0.1 * 0.1)
    assert float(decay_at(jnp.asarray(9), 0.9, 10, "linear")) == pytest.approx(0.9)
    # cosine reaches base at end of warmup
    assert float(decay_at(jnp.asarray(9), 0.9, 10, "cosine")) == pytest.approx(0.9)
    assert float(decay_at(n, 0.9, 10, "none")) == pytest.approx(0.9)


def test_ema_param_filter():
    p0 = _tiny_params()
    mask = make_ema_mask(p0, param_filter=["nested/b"])
    assert mask == {"a": True, "nested": {"b": False}}
    ema = init_ema(p0)
    p1 = jax.tree_util.tree_map(lambda x: x + 1.0, p0)
    ema = update_ema(ema, p1, jnp.asarray(1), base_decay=0.5, mask=mask)
    np.testing.assert_allclose(np.asarray(ema.shadow["a"]), [1.5, 2.5])
    # filtered: shadow untouched
    np.testing.assert_allclose(np.asarray(ema.shadow["nested"]["b"]), [[3.0]])
    # ema_params falls back to live params for filtered entries
    out = ema_params(ema, p1, mask)
    np.testing.assert_allclose(np.asarray(out["nested"]["b"]), [[4.0]])
    np.testing.assert_allclose(np.asarray(out["a"]), [1.5, 2.5])


def test_ema_inside_jit():
    p0 = _tiny_params()
    ema = init_ema(p0)

    @jax.jit
    def step(e, p, s):
        return update_ema(e, p, s, base_decay=0.9, warmup_steps=4, warmup_type="linear")

    p1 = jax.tree_util.tree_map(lambda x: x * 2, p0)
    e = ema
    for s in range(1, 6):
        e = step(e, p1, jnp.asarray(s))
    assert int(e.num_updates) == 5
    assert np.all(np.asarray(e.shadow["a"]) > np.asarray(p0["a"]))


def test_debug_nans_flag_plumbed(tmp_path):
    """Top-level `debug_nans: true` flips jax_debug_nans at train entry
    (the SURVEY §5 anomaly-detection equivalent); always restore."""
    import jax

    from tossctr_tpu.config import Config

    assert jax.config.jax_debug_nans is False
    d = {"exp_name": "dbg", "debug_nans": True,
         "data": {"train_path": "x", "test_path": "y"}}
    cfg = Config.from_dict(d)
    assert bool(cfg.extra.get("debug_nans")) is True
    try:
        jax.config.update("jax_debug_nans", bool(cfg.extra["debug_nans"]))
        assert jax.config.jax_debug_nans is True
    finally:
        jax.config.update("jax_debug_nans", False)
