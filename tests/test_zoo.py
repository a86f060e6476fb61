"""Zoo model forward smoke tests (shapes + finiteness), mirroring the
reference's per-model __main__ blocks (SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.configs import ModelConfig
from kmunet_tpu.models import zoo


STACK_CASES = [
    ("smaat_unet", 4, {}),
    ("mamba_unet", 3, {}),
    ("lptqpn", 4, {"num_blocks": (1, 1, 1, 1), "num_refinement_blocks": 1}),
    ("sceca_net", 4, {"features": (8, 16, 32, 64)}),
    ("swin_unet", 4, {"embed_dim": 24, "num_heads": (2, 4, 6, 8)}),
    ("transunet", 4, {"hidden": 64, "layers": 2, "heads": 4, "mlp_dim": 128}),
]


@pytest.mark.parametrize("name,ncls,extra", STACK_CASES)
def test_stack_models_forward(rng, name, ncls, extra):
    model = zoo.build(ModelConfig(name=name, num_classes=ncls, extra=extra))
    x = jnp.asarray(rng.random((1, 64, 64, 5)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)}, x
    )
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 64, ncls), name
    assert np.isfinite(np.asarray(y)).all(), name


@pytest.mark.parametrize("name", ["convlstm", "trajgru"])
def test_seq_models_forward(rng, name):
    model = zoo.build(ModelConfig(name=name, num_classes=4))
    x = jnp.asarray(rng.random((1, 5, 64, 64)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 4, 64, 64), name
    assert np.isfinite(np.asarray(y)).all(), name
