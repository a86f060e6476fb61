"""Sharded-equals-replicated numerics (VERDICT r1 item 4).

Runs the SAME jitted train step (same init, same batch, fp32) under
  - 1 device (baseline),
  - dp8,
  - dp4 x sp2          (spatial/context parallel: H-axis sharded),
  - dp4 x model2 + FSDP param sharding,
on the 8-virtual-CPU mesh and asserts the loss trajectory and the updated
parameters match the single-device run. This is what actually proves the
GSPMD halo-exchange / psum story for the IWP / DySample / conv stacks under
H-sharding (SURVEY.md §2.5) — the dryrun only proves it compiles.

fp32 reductions over differently-sharded layouts reassociate, so exact
bit-equality is not expected; 1e-5 relative is.

NOT in the matrix: spatial>1 combined with model>1. The XLA SPMD
partitioner (jax 0.9, CPU host platform) miscompiles that layout: weight
gradients of every halo-exchange conv (spatial kernel > 1x1 on H-sharded
activations) come out EXACTLY 2x even with all parameters replicated and
the 'model' axis unused; the forward/loss stays bit-correct, which makes
it silent (diagnosed leaf-by-leaf: stem/KAN-base/decoder/attention conv
kernels all x2, every 1x1 conv and gather-fed conv exact). make_mesh
refuses the layout; test_sp2_model2_upstream_miscompile (opt-in via
RUN_UPSTREAM_SPMD_BUG_CHECK=1) pins the bug so an upstream fix is noticed.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Compiles the full train step under 4 mesh layouts: ~20 min alone on the
# 1-core CI host. Deselected from plain `pytest tests/` (see pyproject
# addopts); run explicitly with `pytest -m heavy tests/`.
pytestmark = pytest.mark.heavy
from jax.sharding import NamedSharding, PartitionSpec as P

from kmunet_tpu.configs import shanghai_km_unet
from kmunet_tpu.parallel import (
    MeshSpec,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_params,
)
from kmunet_tpu.train.engine import (
    build_loss,
    build_model,
    build_optimizer,
    init_state,
    make_train_step,
)


def _cfg():
    cfg = shanghai_km_unet()
    cfg.data.name = "synthetic"
    cfg.data.img_size = 32
    cfg.data.batch_size = 8
    cfg.data.seq_len = 9
    cfg.data.out_frames = 4
    cfg.model.num_classes = 4
    cfg.train.compute_dtype = "float32"
    return cfg


def _run(cfg, spec: MeshSpec, fsdp: bool, n_steps: int = 2,
         allow_spatial_with_model: bool = False):
    """Init deterministically, run n_steps on a fixed batch; return
    (losses, grad_norms, params_after)."""
    d, s, m = spec.data, spec.spatial, spec.model
    devices = jax.devices()[: d * s * m]
    mesh = make_mesh(spec, devices=devices,
                     allow_spatial_with_model=allow_spatial_with_model)

    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))
    if fsdp:
        rules = param_sharding_rules(mesh, state.params, fsdp=True)
        state = state.replace(params=shard_params(state.params, rules))

    batch_np = np.random.default_rng(7).random(
        (cfg.data.batch_size, cfg.data.seq_len, cfg.data.img_size, cfg.data.img_size),
        dtype=np.float32,
    )
    batch = jax.device_put(batch_np, NamedSharding(mesh, P("data", None, "spatial", None)))

    step = make_train_step(model, loss_fn, tx, cfg)
    losses, gnorms = [], []
    rng = jax.random.PRNGKey(3)  # same dropout rng stream for every mesh
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
        gnorms.append(float(metrics["grad_norm"]))
    params = jax.device_get(state.params)
    return losses, gnorms, params


@pytest.fixture(scope="module")
def baseline():
    return _run(_cfg(), MeshSpec(1, 1, 1), fsdp=False)


def _assert_matches(baseline, run):
    """Tolerances calibrated to fp32 reassociation, NOT to sharding bugs: a
    missing psum / wrong halo shows up as O(1) relative error on MOST
    elements (or an exact factor of the shard count). Honest drift measured
    on this model after 2 AdamW steps (dp8 vs 1-device): losses/gnorms match
    to ~1e-4 rel, but a handful of param elements (~0.02%) drift up to
    ~1.4e-3 abs — AdamW's 1/sqrt(v) amplifies tiny-gradient reassociation
    noise. So params are checked elementwise with a small allowed violation
    fraction plus a hard absolute ceiling, which a real sharding bug blows
    through on both counts."""
    b_losses, b_gnorms, b_params = baseline
    losses, gnorms, params = run
    np.testing.assert_allclose(losses, b_losses, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(gnorms, b_gnorms, rtol=1e-2, atol=1e-4)
    flat_b = jax.tree.leaves(b_params)
    flat_r = jax.tree.leaves(params)
    assert len(flat_b) == len(flat_r)
    total, bad = 0, 0
    for pb, pr in zip(flat_b, flat_r):
        pb, pr = np.asarray(pb), np.asarray(pr)
        assert pb.shape == pr.shape
        np.testing.assert_array_less(np.abs(pr - pb).max(), 5e-3)
        close = np.isclose(pr, pb, rtol=1e-2, atol=2e-4)
        total += close.size
        bad += int(close.size - close.sum())
    assert bad / total < 1e-3, f"{bad}/{total} param elements off tolerance"


def test_dp8_matches_single_device(baseline):
    _assert_matches(baseline, _run(_cfg(), MeshSpec(8, 1, 1), fsdp=False))


def test_dp4_sp2_matches_single_device(baseline):
    _assert_matches(baseline, _run(_cfg(), MeshSpec(4, 2, 1), fsdp=False))


def test_dp4_model2_fsdp_matches_single_device(baseline):
    _assert_matches(baseline, _run(_cfg(), MeshSpec(4, 1, 2), fsdp=True))


@pytest.mark.skipif(
    not os.environ.get("RUN_UPSTREAM_SPMD_BUG_CHECK"),
    reason="~10 min compile; opt-in pin of the upstream XLA SPMD bug",
)
@pytest.mark.xfail(
    strict=True,
    reason="XLA SPMD partitioner doubles halo-exchange conv weight grads "
    "when spatial>1 and model>1 coexist (jax 0.9). strict=True: if this "
    "starts passing, upstream fixed it — re-enable the layout in make_mesh.",
)
def test_sp2_model2_upstream_miscompile(baseline):
    _assert_matches(
        baseline,
        _run(_cfg(), MeshSpec(2, 2, 2), fsdp=False,
             allow_spatial_with_model=True),
    )
