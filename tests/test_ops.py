"""Unit tests for core ops vs numpy/torch-derived semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from unidefense_tpu.ops import (
    adaptive_avg_pool,
    bilinear_resize,
    coral,
    downscale,
    frequency_style_transfer,
    gaussian_blur,
    irfft2,
    max_pool,
    nearest_resize,
    rfft2,
    spatial_style_transfer,
    spectrum_channels,
    to_real_channels,
    from_real_channels,
)

RNG = np.random.default_rng(0)


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


class TestFFT:
    def test_roundtrip(self):
        x = RNG.standard_normal((2, 8, 8, 3)).astype(np.float32)
        z = rfft2(jnp.asarray(x))
        back = irfft2(z, s=(8, 8))
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)

    def test_channel_packing_roundtrip(self):
        x = RNG.standard_normal((2, 8, 8, 3)).astype(np.float32)
        z = rfft2(jnp.asarray(x))
        r = to_real_channels(z)
        assert r.shape == (2, 8, 5, 6)
        z2 = from_real_channels(r)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-6)

    def test_matches_torch_rfft2(self):
        x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)
        ref = torch.fft.rfft2(torch.from_numpy(x), norm="ortho")
        ref = torch.cat([ref.real, ref.imag], dim=1).numpy()
        ours = np.asarray(spectrum_channels(jnp.asarray(nhwc(x))))
        np.testing.assert_allclose(nchw(ours), ref, atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("out_size", [(12, 12), (16, 16), (7, 5), (33, 31)])
    def test_bilinear_matches_torch_align_corners(self, out_size):
        x = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), size=out_size, mode="bilinear", align_corners=True
        ).numpy()
        ours = nchw(np.asarray(bilinear_resize(jnp.asarray(nhwc(x)), *out_size)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.parametrize("out_size", [(1, 1), (4, 4), (5, 3), (16, 16)])
    def test_adaptive_avg_pool_matches_torch(self, out_size):
        x = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_size).numpy()
        ours = nchw(np.asarray(adaptive_avg_pool(jnp.asarray(nhwc(x)), *out_size)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_nearest_matches_torch(self):
        x = RNG.standard_normal((1, 3, 16, 16)).astype(np.float32)
        down = F.interpolate(torch.from_numpy(x), scale_factor=0.75, mode="nearest")
        up = F.interpolate(down, size=(16, 16), mode="nearest").numpy()
        ours = nchw(np.asarray(downscale(jnp.asarray(nhwc(x)), 0.75)))
        np.testing.assert_allclose(ours, up, atol=1e-6)

    def test_nearest_resize_identity(self):
        x = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(nearest_resize(x, 8, 8)), np.asarray(x))

    def test_max_pool_matches_torch(self):
        x = RNG.standard_normal((2, 4, 9, 9)).astype(np.float32)
        ref = F.max_pool2d(torch.from_numpy(x), kernel_size=3, stride=2, padding=1).numpy()
        ours = nchw(np.asarray(max_pool(jnp.asarray(nhwc(x)), 3, 2, 1)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestPerturb:
    def test_gaussian_blur_matches_torchvision_semantics(self):
        """torchvision gaussian_blur(k=5) == separable conv with the
        sigma=0.3*((k-1)*0.5-1)+0.8 kernel and reflect padding; re-derived in
        torch (torchvision itself is not installed on this image)."""
        from unidefense_tpu.ops.perturb import _gaussian_kernel_1d

        k = 5
        kern = _gaussian_kernel_1d(k)
        x = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
        xt = torch.from_numpy(x)
        pad = k // 2
        xp = torch.nn.functional.pad(xt, (pad, pad, pad, pad), mode="reflect")
        kh = torch.from_numpy(kern).view(1, 1, k, 1).repeat(3, 1, 1, 1)
        kw = torch.from_numpy(kern).view(1, 1, 1, k).repeat(3, 1, 1, 1)
        ref = torch.nn.functional.conv2d(
            torch.nn.functional.conv2d(xp, kh, groups=3), kw, groups=3
        ).numpy()
        ours = nchw(np.asarray(gaussian_blur(jnp.asarray(nhwc(x)), k)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestStyleTransfer:
    def test_frequency_preserves_phase(self):
        rng = jax.random.PRNGKey(0)
        c = jnp.asarray(RNG.standard_normal((2, 8, 8, 3)).astype(np.float32))
        out = frequency_style_transfer(rng, c, c)
        # Identical content/style -> amplitude mix is a no-op.
        np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-4)

    def test_spatial_identity_when_same(self):
        rng = jax.random.PRNGKey(1)
        c = jnp.asarray(RNG.standard_normal((2, 8, 8, 3)).astype(np.float32))
        out = spatial_style_transfer(rng, c, c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-5)

    def test_spatial_matches_torch_semantics(self):
        # Re-derive the reference computation with a fixed lambda.
        c_np = RNG.standard_normal((1, 2, 4, 4)).astype(np.float32)
        s_np = RNG.standard_normal((1, 2, 4, 4)).astype(np.float32)
        lmda = 0.7
        B, C, H, W = c_np.shape
        cf = torch.from_numpy(c_np).view(B, C, -1)
        sf = torch.from_numpy(s_np).view(B, C, -1)
        _, index_content = torch.sort(cf, dim=-1)
        value_style, _ = torch.sort(sf, dim=-1)
        inverse_index = index_content.argsort(-1)
        ref = cf + (1 - lmda) * value_style.gather(-1, inverse_index) - (1 - lmda) * cf
        ref = ref.view(B, C, H, W).numpy()

        import unidefense_tpu.ops.style as style_mod

        orig = style_mod._sample_lmda
        style_mod._sample_lmda = lambda rng, b, dt: jnp.full((b,), lmda, dtype=dt)
        try:
            ours = spatial_style_transfer(
                jax.random.PRNGKey(0), jnp.asarray(nhwc(c_np)), jnp.asarray(nhwc(s_np))
            )
        finally:
            style_mod._sample_lmda = orig
        np.testing.assert_allclose(nchw(np.asarray(ours)), ref, atol=1e-5)


class TestCoral:
    """The reference's coral contains a sign-convention-dependent quirk
    (U sqrt(D) Vh^T via torch.linalg.svd — see ops/coral.py), so bitwise
    parity with torch-LAPACK is not a well-defined target. We verify (a) the
    formula wiring against a numpy re-derivation that uses OUR
    eigendecomposition, and (b) the statistical contract of the transform."""

    def test_formula_wiring(self):
        from unidefense_tpu.ops.eig3 import sym_eig3x3

        s_np = RNG.standard_normal((3, 8, 8)).astype(np.float32)
        t_np = RNG.standard_normal((3, 8, 8)).astype(np.float32)

        def np_quirk_sqrt(x):
            d, u = (np.asarray(v) for v in sym_eig3x3(jnp.asarray(x)))
            return (u * np.sqrt(d)[None, :]) @ u

        def np_quirk_inv_sqrt(x):
            d, u = (np.asarray(v) for v in sym_eig3x3(jnp.asarray(x)))
            return (u.T * (1.0 / np.sqrt(d))[None, :]) @ u.T

        def np_coral(source, target):
            def flat_ms(feat):
                f = feat.reshape(3, -1)
                return f, f.mean(-1, keepdims=True), f.std(-1, keepdims=True, ddof=1)

            sf, sm, ss = flat_ms(source)
            s_norm = (sf - sm) / ss
            s_cov = s_norm @ s_norm.T + np.eye(3, dtype=np.float32)
            tf, tm, ts = flat_ms(target)
            t_norm = (tf - tm) / ts
            t_cov = t_norm @ t_norm.T + np.eye(3, dtype=np.float32)
            xfer = np_quirk_sqrt(t_cov) @ (np_quirk_inv_sqrt(s_cov) @ s_norm)
            return (xfer * ts + tm).reshape(source.shape)

        ref = np_coral(s_np, t_np)
        ours = coral(
            jnp.asarray(np.transpose(s_np, (1, 2, 0))[None]),
            jnp.asarray(np.transpose(t_np, (1, 2, 0))[None]),
        )
        ours = np.transpose(np.asarray(ours)[0], (2, 0, 1))
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_output_statistics(self):
        """The transfer maps source pixels through an invertible color map
        anchored at the target's channel mean (DC is preserved: the quirky
        maps act on zero-mean features)."""
        s = RNG.standard_normal((1, 16, 16, 3)).astype(np.float32)
        t = (RNG.standard_normal((1, 16, 16, 3)) * 2 + 1).astype(np.float32)
        out = np.asarray(coral(jnp.asarray(s), jnp.asarray(t)))
        assert out.shape == s.shape
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(
            out.reshape(-1, 3).mean(0), t.reshape(-1, 3).mean(0), atol=1e-3
        )
