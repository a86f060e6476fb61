#!/usr/bin/env python
"""Inference-only CLI: checkpoint -> predicted frame stacks.

The reference has no predict-without-ground-truth surface (its test() always
evaluates against GT, train_shanghai.py:218-283); serving needs one. Loads a
checkpoint, runs the jitted forward over the test split's *input* frames, and
writes ``predictions.npz`` (pred: (N, out_frames, H, W) float32 in [0, 1])
plus optional radar-colormap PNG strips.

    python scripts/predict.py --ckpt=<checkpoint dir> \
        [--which=best|latest] [--config=shanghai|laps|synthetic] \
        [--out=outputs/predict] [--vis=N] [any --a.b=c override]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kmunet_tpu.configs import laps_km_unet, parse_overrides, shanghai_km_unet


def main():
    ckpt_dir = None
    which = "best"
    config_name = "shanghai"
    out = "outputs/predict"
    vis_n = 0
    rest = []
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            ckpt_dir = a.split("=", 1)[1]
        elif a.startswith("--which="):
            which = a.split("=", 1)[1]
        elif a.startswith("--config="):
            config_name = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--vis="):
            vis_n = int(a.split("=", 1)[1])
        else:
            rest.append(a)
    if not ckpt_dir:
        sys.exit("usage: predict.py --ckpt=<checkpoint dir> [--which=best|latest]"
                 " [--out=dir] [--vis=N]")
    if which not in ("best", "latest"):
        sys.exit(f"--which={which}: expected 'best' or 'latest'")

    cfg = laps_km_unet() if config_name == "laps" else shanghai_km_unet()
    if config_name == "synthetic":
        cfg.data.name = "synthetic"
    parse_overrides(cfg, rest)
    if cfg.data.path is None and cfg.data.name == "shanghai":
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"

    import jax

    from kmunet_tpu.data import DataLoader
    from kmunet_tpu.parallel import MeshSpec, batch_sharding, make_mesh, replicated
    from kmunet_tpu.train.checkpoint import CheckpointManager
    from kmunet_tpu.train.engine import (
        _model_layout, _to_btHW, build_datasets, build_loss, build_model,
        build_optimizer, init_state)

    mesh = make_mesh(MeshSpec(cfg.mesh.data, cfg.mesh.spatial, cfg.mesh.model))
    _, _, test_ds = build_datasets(cfg)
    loader = DataLoader(test_ds, cfg.data.batch_size, shuffle=False,
                        seed=cfg.train.seed, num_workers=cfg.data.num_workers,
                        sharding=batch_sharding(mesh, ndim=4))
    if len(loader) == 0:
        sys.exit(f"test split ({len(test_ds)}) smaller than batch "
                 f"({cfg.data.batch_size})")

    model = build_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=1)
    template = jax.eval_shape(
        lambda: init_state(cfg, model, tx, jax.random.PRNGKey(cfg.train.seed)))
    mgr = CheckpointManager(ckpt_dir)
    step, state = (mgr.restore_best(template) if which == "best"
                   else mgr.restore_latest(template))
    mgr.close()
    if state is None:
        sys.exit(f"no checkpoint in {ckpt_dir}")
    state = jax.device_put(state, replicated(mesh))
    print(f"restored checkpoint step {step} ({which})")

    layout = _model_layout(cfg)
    in_f = cfg.data.in_frames

    @jax.jit
    def forward(state, inp):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, inp, train=False)
        return _to_btHW(out.astype(np.float32), layout)

    os.makedirs(out, exist_ok=True)
    preds, inputs = [], []
    for bi, batch in enumerate(loader):
        x = batch[:, :in_f]
        if layout == "stack":
            x = x.transpose(0, 2, 3, 1)
        pred = np.asarray(forward(state, x), np.float32).clip(0.0, 1.0)
        preds.append(pred)
        inputs.append(np.asarray(batch[:, :in_f], np.float32))
        if vis_n and bi < vis_n:
            from kmunet_tpu.utils.vis import vis_res

            vis_res(pred[0], None, inputs[-1][0],
                    os.path.join(out, "vis", f"batch_{bi}_sample_0"))
    pred = np.concatenate(preds)
    np.savez_compressed(os.path.join(out, "predictions.npz"),
                        pred=pred, checkpoint_step=int(step),
                        in_frames=in_f, model=cfg.model.name)
    print(f"wrote {pred.shape} predictions -> {os.path.join(out, 'predictions.npz')}")


if __name__ == "__main__":
    main()
