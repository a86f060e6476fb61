"""Optimizer/schedule factory tests (models/utils.py:64-214 parity)."""

import numpy as np
import pytest
import jax.numpy as jnp
import optax

from kmunet_tpu.train.optimizers import PlateauScheduler, make_optimizer, make_schedule

ALL_OPTS = ["Adadelta", "Adagrad", "Adam", "AdamW", "Adamax", "ASGD",
            "RMSprop", "Rprop", "SGD"]


@pytest.mark.parametrize("name", ALL_OPTS)
def test_every_reference_optimizer_steps(name, rng):
    tx = make_optimizer(name, 1e-3, weight_decay=0.01 if name != "Rprop" else 0.0)
    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    new = params
    for _ in range(2):  # Rprop's first update is zero (sign history warmup)
        updates, state = tx.update(grads, state, new)
        new = optax.apply_updates(new, updates)
    assert np.isfinite(np.asarray(new["w"])).all()
    assert float(np.abs(np.asarray(new["w"]) - np.asarray(params["w"])).max()) > 0


def test_step_lr_schedule():
    s = make_schedule("StepLR", 1.0, steps_per_epoch=10, step_size=2, gamma=0.1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(19)) == pytest.approx(1.0)   # epoch 1
    assert float(s(20)) == pytest.approx(0.1)   # epoch 2
    assert float(s(40)) == pytest.approx(0.01)  # epoch 4


def test_multistep_and_exponential():
    ms = make_schedule("MultiStepLR", 1.0, 1, milestones=(3, 6), gamma=0.5)
    assert float(ms(2)) == pytest.approx(1.0)
    assert float(ms(3)) == pytest.approx(0.5)
    assert float(ms(6)) == pytest.approx(0.25)
    ex = make_schedule("ExponentialLR", 2.0, 1, gamma=0.9)
    assert float(ex(3)) == pytest.approx(2.0 * 0.9**3)


def test_cosine_matches_torch_formula():
    s = make_schedule("CosineAnnealingLR", 1e-3, 1, t_max=200, eta_min=5e-4)
    # epoch 0 -> base lr; epoch 200 -> eta_min
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(200)) == pytest.approx(5e-4)


def test_warmup_cosine():
    s = make_schedule("WP_CosineLR", 1.0, 1, warm_up_epochs=5, epochs=10)
    assert float(s(2)) == pytest.approx(0.4)
    assert float(s(5)) == pytest.approx(1.0)
    assert float(s(10)) == pytest.approx(0.0, abs=1e-6)


def test_plateau_controller():
    p = PlateauScheduler(factor=0.5, patience=1)
    assert p.update(1.0) == 1.0
    assert p.update(0.5) == 1.0   # improvement
    assert p.update(0.6) == 1.0   # bad 1
    assert p.update(0.6) == 0.5   # bad 2 > patience -> decay


def test_wd_mask_norms_excludes_1d_params():
    """wd_mask_norms=True: weight decay hits kernels (ndim>=2) but not norm
    scales/biases (ndim==1) — the opt-in fix for the late-horizon
    output_norm gamma collapse (BASELINE.md round 5)."""
    import jax
    import jax.numpy as jnp

    from kmunet_tpu.configs import shanghai_km_unet
    from kmunet_tpu.train.engine import build_optimizer

    cfg = shanghai_km_unet()
    cfg.train.wd_mask_norms = True
    cfg.train.schedule = "constant"
    tx = build_optimizer(cfg, steps_per_epoch=1)
    params = {"kernel": jnp.ones((3, 3)), "scale": jnp.ones((3,))}
    grads = jax.tree.map(jnp.zeros_like, params)
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    # zero grad => update is pure decay: nonzero on kernel, zero on scale
    assert float(jnp.abs(upd["kernel"]).max()) > 0
    assert float(jnp.abs(upd["scale"]).max()) == 0.0
