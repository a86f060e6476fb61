"""EfficientViM classifier smoke (reference C6; fixed stage unpack)."""

import numpy as np
import jax
import jax.numpy as jnp

from kmunet_tpu.models.efficient_vim import EfficientViM_M1


def test_classifier_forward_and_grad(rng):
    m = EfficientViM_M1(num_classes=10)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()

    def loss(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_distillation_head(rng):
    """distillation=True: train returns (z, z_dist); eval returns their mean
    (efficient_vim_init.py:158-166, 226-243)."""
    from kmunet_tpu.models.efficient_vim import EfficientViM

    m = EfficientViM(num_classes=7, embed_dim=(16, 24, 32), depths=(1, 1, 1),
                     state_dim=(16, 9, 4), distillation=True)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "weights_dist" in variables["params"]
    assert "head0_dist" in variables["params"]

    (z, z_dist), _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert z.shape == z_dist.shape == (2, 7)

    z_eval, state = m.apply(variables, x, mutable=["intermediates"])
    ze, ze_dist = state["intermediates"]["logits_pair"][0]
    np.testing.assert_allclose(np.asarray(z_eval), np.asarray((ze + ze_dist) / 2),
                               rtol=2e-5, atol=2e-5)
    # the two head ladders are distinct parameterizations
    assert float(jnp.abs(ze - ze_dist).max()) > 1e-4
