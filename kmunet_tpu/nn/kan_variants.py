"""Alternative KAN basis layers (library breadth, reference component C3).

Re-derivations of `/root/reference/convKAN/KANlayers.py` and
`convKAN/utils.py`: Chebyshev (clamp+acos/cos), FastKAN (Gaussian RBF),
FasterKAN (RSWAF sech^2 with the reference's hand-written — and deliberately
approximate — backward), GRAM (Gram polynomials), WavKAN (5 mother
wavelets), Jacobi (3-term recurrence), ReLUKAN (squared ReLU-window),
RBFKAN, and the randn-init KANLayer with LayerNorm+PReLU. Only
KANLinear/KANConv2d (nn/kan.py) are wired into KM_UNetV3; these exist for
API parity and experimentation (KM_UNetV3_SH.py:27-34 lists them as branch
options).

All layers act on the trailing feature axis of arbitrary-rank inputs;
``PatchKANConv2d`` applies any of them over unfolded 2D patches, replacing
the reference's per-variant unfold wrappers (KANConv2Dlayers.py:40-294).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch, normal_init


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class ChebyKANLayer(nn.Module):
    """Chebyshev basis via clamp + acos/cos trick (KANlayers.py:123-154)."""

    features: int
    degree: int = 4

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        coeffs = self.param(
            "cheby_coeffs",
            normal_init(std=1.0 / (in_dim * (self.degree + 1))),
            (in_dim, self.features, self.degree + 1),
        )
        x = jnp.clip(x, -1.0, 1.0)
        theta = jnp.arccos(x)[..., None] * jnp.arange(self.degree + 1, dtype=x.dtype)
        basis = jnp.cos(theta)  # (..., in, degree+1)
        return jnp.einsum("...id,iod->...o", basis, coeffs)


class FastKANLayer(nn.Module):
    """LayerNorm -> Gaussian-RBF grid -> linear (+SiLU base) (:89-119)."""

    features: int
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        xn = nn.LayerNorm(epsilon=1e-5, name="layernorm")(x)
        grid = jnp.linspace(self.grid_min, self.grid_max, self.num_grids)
        denom = (self.grid_max - self.grid_min) / (self.num_grids - 1)
        basis = jnp.exp(-(((xn[..., None] - grid) / denom) ** 2))
        basis = basis.reshape(*x.shape[:-1], in_dim * self.num_grids)
        ret = nn.Dense(
            self.features, use_bias=False,
            kernel_init=nn.initializers.truncated_normal(0.1), name="spline_linear",
        )(basis)
        if self.use_base:
            ret = ret + nn.Dense(
                self.features, kernel_init=kaiming_uniform_torch(), name="base_linear"
            )(jax.nn.silu(x))
        return ret


def _rswaf(x, grid, inv_denominator):
    """RSWAF basis with the reference's custom autograd semantics
    (convKAN/utils.py:26-91). Forward: sech^2(x - grid) — note the
    reference computes tanh on the *unscaled* diff (its ``diff_mul`` is
    dead), and its hand-written backward multiplies the input gradient by
    inv_denominator anyway; both quirks are replicated exactly."""

    @jax.custom_vjp
    def f(x):
        t = jnp.tanh(x[..., None] - grid)
        return 1.0 - t * t

    def fwd(x):
        diff = x[..., None] - grid
        t = jnp.tanh(diff)
        sech2 = 1.0 - t * t
        return sech2, (t, sech2)

    def bwd(res, g):
        t, sech2 = res
        gi = jnp.sum(-2.0 * t * sech2 * g, axis=-1) * inv_denominator
        return (gi,)

    f.defvjp(fwd, bwd)
    return f(x)


class FasterKANLayer(nn.Module):
    """LayerNorm -> RSWAF basis -> xavier linear (:423-469)."""

    features: int
    grid_min: float = -1.2
    grid_max: float = 0.2
    num_grids: int = 8
    inv_denominator: float = 0.5

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        xn = nn.LayerNorm(epsilon=1e-5, name="layernorm")(x)
        grid = jnp.linspace(self.grid_min, self.grid_max, self.num_grids)
        basis = _rswaf(xn, grid, self.inv_denominator)
        basis = basis.reshape(*x.shape[:-1], in_dim * self.num_grids)
        return nn.Dense(
            self.features, use_bias=False, kernel_init=_xavier_uniform(),
            name="spline_linear",
        )(basis)


class GRAMLayer(nn.Module):
    """Gram-polynomial basis with learned beta weights (:157-232)."""

    features: int
    degree: int = 3
    act: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        beta_w = self.param(
            "beta_weights",
            normal_init(std=1.0 / (in_dim * (self.degree + 1.0))),
            (self.degree + 1,),
        )
        gram_w = self.param(
            "grams_basis_weights", _xavier_uniform(),
            (in_dim, self.features, self.degree + 1),
        )
        base_w = self.param("base_weights", _xavier_uniform(), (in_dim, self.features))

        basis = jnp.dot(self.act(x), base_w)

        xt = jnp.tanh(x)
        p0 = jnp.ones_like(xt)
        polys = [p0]
        if self.degree >= 1:
            polys.append(xt)
        for i in range(2, self.degree + 1):
            n, m = i - 1, i
            beta = (((m + n) * (m - n) * n**2) / (m**2 / (4.0 * n**2 - 1.0))) * beta_w[n]
            polys.append(xt * polys[-1] - beta * polys[-2])
        grams = self.act(jnp.stack(polys, axis=-1))
        y = jnp.einsum("...ld,lod->...o", grams, gram_w)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y + basis)
        return self.act(y)


class WavKANLayer(nn.Module):
    """Mother-wavelet basis with per-(out,in) scale/translation (:235-328)."""

    features: int
    wavelet_type: str = "mexican_hat"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.features, in_dim))
        trans = self.param("translation", nn.initializers.zeros, (self.features, in_dim))
        wav_w = self.param("wavelet_weights", kaiming_uniform_torch(), (self.features, in_dim))
        base_w = self.param("weight1", kaiming_uniform_torch(), (self.features, in_dim))

        xs = (x[..., None, :] - trans) / scale  # (..., out, in)
        if self.wavelet_type == "mexican_hat":
            wav = (2.0 / (math.sqrt(3) * math.pi**0.25)) * (xs**2 - 1) * jnp.exp(-0.5 * xs**2)
        elif self.wavelet_type == "morlet":
            wav = jnp.exp(-0.5 * xs**2) * jnp.cos(5.0 * xs)
        elif self.wavelet_type == "dog":
            wav = -xs * jnp.exp(-0.5 * xs**2)
        elif self.wavelet_type == "meyer":
            v = jnp.abs(xs)
            nu = lambda t: t**4 * (35 - 84 * t + 70 * t**2 - 20 * t**3)  # noqa: E731
            aux = jnp.where(
                v <= 0.5, 1.0,
                jnp.where(v >= 1.0, 0.0, jnp.cos(math.pi / 2 * nu(2 * v - 1))),
            )
            wav = jnp.sin(math.pi * v) * aux
        elif self.wavelet_type == "shannon":
            sinc = jnp.sinc(xs / math.pi)
            n = xs.shape[-1]
            window = 0.54 - 0.46 * jnp.cos(2 * math.pi * jnp.arange(n) / (n - 1))
            wav = sinc * window
        else:
            raise ValueError(f"unsupported wavelet {self.wavelet_type}")

        wavelet_out = jnp.sum(wav * wav_w, axis=-1)
        base_out = jnp.dot(jax.nn.silu(x), base_w.T)
        y = wavelet_out + base_out
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                            name="bn")(y)


class JacobiKANLayer(nn.Module):
    """Jacobi-polynomial basis via 3-term recurrence (:331-377)."""

    features: int
    degree: int = 4
    a: float = 1.0
    b: float = 1.0
    act: Callable = jax.nn.silu

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        base_w = self.param("base_weights", _xavier_uniform(), (in_dim, self.features))
        coeffs = self.param(
            "jacobi_coeffs",
            normal_init(std=1.0 / (in_dim * (self.degree + 1))),
            (in_dim, self.features, self.degree + 1),
        )
        basis = jnp.dot(self.act(x), base_w)

        xt = jnp.tanh(x)
        a, b = self.a, self.b
        polys = [jnp.ones_like(xt)]
        if self.degree >= 1:
            polys.append(((a - b) + (a + b + 2) * xt) / 2.0)
        for i in range(2, self.degree + 1):
            t_k = (2 * i + a + b) * (2 * i + a + b - 1) / (2 * i * (i + a + b))
            t_k1 = (2 * i + a + b - 1) * (a * a - b * b) / (
                2 * i * (i + a + b) * (2 * i + a + b - 2)
            )
            t_k2 = (i + a - 1) * (i + b - 1) * (2 * i + a + b) / (
                i * (i + a + b) * (2 * i + a + b - 2)
            )
            polys.append((t_k * xt + t_k1) * polys[-1] - t_k2 * polys[-2])
        jacobi = jnp.stack(polys, axis=-1)
        y = jnp.einsum("...id,iod->...o", jacobi, coeffs)
        return self.act(nn.LayerNorm(epsilon=1e-5, name="norm")(y + basis))


class ReLUKANLayer(nn.Module):
    """Squared ReLU-window basis + equal-size contraction (:382-410)."""

    features: int
    g: int = 5
    k: int = 3
    train_ab: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        g, k = self.g, self.k
        r = 4.0 * g * g / ((k + 1) * (k + 1))
        low0 = np.arange(-k, g) / g
        high0 = low0 + (k + 1) / g
        if self.train_ab:
            low = self.param("phase_low", lambda *_: jnp.asarray(
                np.tile(low0, (in_dim, 1)), jnp.float32), (in_dim, g + k))
            high = self.param("phase_height", lambda *_: jnp.asarray(
                np.tile(high0, (in_dim, 1)), jnp.float32), (in_dim, g + k))
        else:
            low = jnp.asarray(np.tile(low0, (in_dim, 1)), jnp.float32)
            high = jnp.asarray(np.tile(high0, (in_dim, 1)), jnp.float32)

        x1 = nn.relu(x[..., None] - low)
        x2 = nn.relu(high - x[..., None])
        basis = (x1 * x2 * r) ** 2  # (..., in, g+k)
        basis = basis.reshape(*x.shape[:-1], in_dim * (g + k))
        # the reference's "equal size conv" is a dense layer over all bins
        return nn.Dense(
            self.features, kernel_init=kaiming_uniform_torch(), name="equal_size_conv"
        )(basis)


class RBFKANLayer(nn.Module):
    """RBF basis linear + optional SiLU base branch (:472-503)."""

    features: int
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        grid = jnp.linspace(self.grid_min, self.grid_max, self.num_grids)
        denom = (self.grid_max - self.grid_min) / (self.num_grids - 1)
        basis = jnp.exp(-(((x[..., None] - grid) / denom) ** 2))
        basis = basis.reshape(*x.shape[:-1], in_dim * self.num_grids)
        ret = nn.Dense(
            self.features, use_bias=False,
            kernel_init=normal_init(std=0.1), name="rbf_linear",
        )(basis)
        if self.use_base:
            ret = ret + nn.Dense(
                self.features, kernel_init=kaiming_uniform_torch(), name="base_linear"
            )(jax.nn.silu(x))
        return ret


class PatchKANConv2d(nn.Module):
    """Apply any trailing-axis KAN layer over unfolded kxk patches (NHWC).

    Generic replacement for the reference's per-variant conv wrappers
    (ChebyKANConv2d etc., KANConv2Dlayers.py:40-294): zero-pad, extract
    patches in torch-unfold (c, kh, kw) feature order, run the layer.
    """

    layer: nn.Module
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        B, H, W, C = x.shape
        k, s, p = self.kernel_size, self.stride, self.padding
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0))) if p else x
        patches = jax.lax.conv_general_dilated_patches(
            xp, (k, k), (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )  # feature order (C, kh, kw) == torch unfold
        return self.layer(patches, *args, **kwargs)
