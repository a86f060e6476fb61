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
