"""Utils layer tests: vis colormap, CSV logger, flops counter, seed; plus a
regression test for the evaluator's degenerate-count NaN behavior."""

import os

import numpy as np
import jax.numpy as jnp

from kmunet_tpu.metrics import Evaluator
from kmunet_tpu.utils import CSVLogger, flops_of, set_seed
from kmunet_tpu.utils.vis import gray2color, tile_frames
from kmunet_tpu.data.shanghai import COLOR_MAP, PIXEL_SCALE


def test_gray2color_bins():
    img = np.array([[0.0, 4.9, 5.0, 74.9, 76.0, 89.0]])
    rgba = gray2color(img)
    # 0 and 4.9 fall in bin 0; 5.0 in bin 1; 76+ in the last bin
    np.testing.assert_allclose(rgba[0, 0], COLOR_MAP[0])
    np.testing.assert_allclose(rgba[0, 1], COLOR_MAP[0])
    np.testing.assert_allclose(rgba[0, 2], COLOR_MAP[1])
    np.testing.assert_allclose(rgba[0, 4], COLOR_MAP[15])
    np.testing.assert_allclose(rgba[0, 5], COLOR_MAP[15])


def test_tile_frames_layout():
    frames = np.random.rand(3, 8, 8)
    strip = tile_frames(frames, gap=10)
    assert strip.shape == (8, 3 * 8 + 2 * 10, 4)


def test_csv_logger(tmp_path):
    p = os.path.join(tmp_path, "log.csv")
    lg = CSVLogger(p)
    lg.log({"epoch": 0, "loss": 1.5})
    lg.log({"epoch": 1, "loss": 1.2})
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "epoch,loss" and len(lines) == 3


def test_flops_of_matmul():
    a = jnp.ones((64, 64))
    got = flops_of(lambda x: x @ x, a)
    # 2*N^3 = 524288 (allow compiler fusion variance)
    assert got["flops"] > 1e5


def test_set_seed_reproducible():
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_evaluator_no_positives_gives_nan_not_crash(rng):
    """Regression: untrained model with zero predicted positives must yield
    NaN metrics (reference np.seterr semantics), not ZeroDivisionError."""
    true = np.zeros((1, 2, 16, 16), np.float32)
    pred = np.zeros((1, 2, 16, 16), np.float32)
    ev = Evaluator(seq_len=2, value_scale=90)
    ev.evaluate(true, pred)
    r = ev.done()
    assert np.isnan(r["threshold_metrics"][20]["CSI"])
    assert np.isnan(r["FAR"])


def test_override_dict_leaf_boolean_coercion():
    """--model.extra.flag=false must become bool False, not the truthy
    string 'false' (round-5 footgun: a head_norm ablation silently ran
    with the norm still on)."""
    from kmunet_tpu.configs import parse_overrides, shanghai_km_unet

    cfg = shanghai_km_unet()
    parse_overrides(cfg, ["--model.extra.head_norm=false",
                          "--model.extra.other=true",
                          "--model.extra.rate=0.5"])
    assert cfg.model.extra["head_norm"] is False
    assert cfg.model.extra["other"] is True
    assert cfg.model.extra["rate"] == 0.5
