"""KM_UNetV3 flagship model tests (shape, finiteness, grads, both variants) —
the reference's smoke block (KM_UNetV3_SH.py:521-560), systematized."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.models import KM_UNetV3_SH, KM_UNetV3_LAPS


@pytest.mark.parametrize(
    "factory,num_out", [(KM_UNetV3_SH, 20), (KM_UNetV3_LAPS, 3)]
)
def test_forward_shapes(rng, factory, num_out):
    model = factory(num_classes=num_out)
    x = jnp.asarray(rng.random((2, 5, 64, 64)).astype(np.float32)).transpose(0, 2, 3, 1)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 64, 64, num_out)
    yn = np.asarray(y)
    assert np.isfinite(yn).all()
    assert (yn >= 0).all() and (yn <= 1).all()  # sigmoid output head


def test_train_step_grads_finite(rng):
    model = KM_UNetV3_SH(num_classes=4)
    x = jnp.asarray(rng.random((1, 32, 32, 5)).astype(np.float32))
    t = jnp.asarray(rng.random((1, 32, 32, 4)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(p):
        y, mut = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean((y - t) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    # Most parameters receive gradient. Zero-grad params at init are expected
    # by design: bn_weight_init=0 branches (dwconv/FFN in every EfficientViM
    # block) and IWP's dead high_freq_conv (see nn/wavelet.py docstring).
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(grads))
    total = len(jax.tree.leaves(grads))
    assert nonzero / total > 0.6, f"only {nonzero}/{total} grads nonzero"
    # Load-bearing paths must always have gradient:
    flat = {"/".join(map(str, k)): v for k, v in
            jax.tree_util.tree_flatten_with_path(grads)[0]}
    for key_sub in ("conv_f", "head", "dec1_kan", "bridge"):
        hits = [v for k, v in flat.items() if key_sub in k]
        assert hits and any(float(jnp.abs(v).sum()) > 0 for v in hits), key_sub


def test_param_count_reasonable():
    model = KM_UNetV3_SH(num_classes=20)
    x = jnp.zeros((1, 64, 64, 5))
    # eval_shape: param counting needs shapes only, not a real init (saves
    # ~30 s of eager-dispatch on the 1-core CPU harness).
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # reference flagship is a small model (embed dims 16/32/64)
    assert 2e5 < n < 5e6, n
