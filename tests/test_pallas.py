"""Pallas preprocessing kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.pallas_preprocess import normalize_flip


def _jnp_ref(u8, rng, mean, std, hflip_p):
    x = u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if hflip_p > 0 and rng is not None:
        flips = jax.random.uniform(rng, (u8.shape[0], 1, 1, 1)) < hflip_p
        x = jnp.where(flips, x[:, :, ::-1, :], x)
    return x


def test_normalize_flip_matches_reference():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray((rng.random((4, 16, 16, 3)) * 255).astype(np.uint8))
    key = jax.random.PRNGKey(3)
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.25, 0.2)
    out = normalize_flip(u8, key, mean=mean, std=std, hflip_p=0.5, interpret=True)
    ref = _jnp_ref(u8, key, mean, std, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_normalize_no_flip():
    rng = np.random.default_rng(1)
    u8 = jnp.asarray((rng.random((2, 8, 8, 3)) * 255).astype(np.uint8))
    out = normalize_flip(u8, None, hflip_p=0.0, interpret=True)
    ref = _jnp_ref(u8, None, (0.5,) * 3, (0.5,) * 3, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestSFConvPallas:
    """Fused SFConv freq-branch kernel == the spatial closed form, fwd and
    grads (interpret mode on CPU; the TPU path is the same kernel)."""

    def _setup(self, shape=(2, 8, 8, 5)):
        import numpy as np

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        c = shape[-1]
        wp = jnp.asarray(rng.standard_normal((2 * c, 2 * c)), jnp.float32)
        return x, wp

    def test_forward_matches_spatial_form(self):
        from unidefense_tpu.ops.sfconv_pallas import sfconv_freq_pallas
        from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

        for shape in [(2, 8, 8, 5), (1, 6, 10, 3), (2, 5, 7, 4)]:
            x, wp = self._setup(shape)
            ref = sfconv_freq_spatial(x, wp)
            out = sfconv_freq_pallas(x, wp, True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)

    def test_grads_match_spatial_form(self):
        import jax

        from unidefense_tpu.ops.sfconv_pallas import sfconv_freq_pallas
        from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

        x, wp = self._setup((2, 6, 8, 3))
        cot = jnp.asarray(
            np.random.default_rng(1).standard_normal(x.shape), jnp.float32
        )

        def loss_ref(x, wp):
            return jnp.sum(sfconv_freq_spatial(x, wp) * cot)

        def loss_pal(x, wp):
            return jnp.sum(sfconv_freq_pallas(x, wp, True) * cot)

        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wp)
        gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(x, wp)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=1e-4, rtol=1e-4)

    def test_eligibility_gate(self):
        from unidefense_tpu.ops.sfconv_pallas import pallas_eligible

        # CPU backend in tests -> never eligible (kernel still unit-tested
        # through interpret mode above)
        assert not pallas_eligible((2, 64, 64, 192))


class TestSFConvPallasV3:
    """Row-tiled v3 kernel (small-W regime) vs the exact spatial closed form
    — forward and both grads, interpret mode on CPU (TPU runs the same
    kernel)."""

    def _pair(self, n, h, w, c, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        wp = jnp.asarray(rng.normal(size=(2 * c, 2 * c)).astype(np.float32))
        return x, wp

    def test_forward_matches_spatial_form(self):
        from unidefense_tpu.ops.sfconv_pallas import sfconv_freq_pallas_v3
        from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

        for shape in [(2, 8, 8, 6), (1, 12, 8, 4), (2, 6, 10, 6), (2, 9, 4, 4)]:
            x, wp = self._pair(*shape)
            ref = sfconv_freq_spatial(x, wp)
            out = sfconv_freq_pallas_v3(x, wp, True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    def test_grads_match_spatial_form(self):
        import jax

        from unidefense_tpu.ops.sfconv_pallas import sfconv_freq_pallas_v3
        from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

        x, wp = self._pair(2, 8, 8, 6)
        cot = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 8, 6)).astype(np.float32))

        def f_ref(x, wp):
            return jnp.sum(sfconv_freq_spatial(x, wp) * cot)

        def f_pal(x, wp):
            return jnp.sum(sfconv_freq_pallas_v3(x, wp, True) * cot)

        gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, wp)
        gx_p, gw_p = jax.grad(f_pal, argnums=(0, 1))(x, wp)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   rtol=1e-3, atol=1e-3)

    def test_v4_forward_and_grads_match_spatial_form(self):
        import jax

        from unidefense_tpu.ops.sfconv_pallas import sfconv_freq_pallas_v4
        from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

        for shape in [(2, 8, 8, 6), (1, 12, 8, 4), (2, 6, 10, 6)]:
            x, wp = self._pair(*shape)
            ref = sfconv_freq_spatial(x, wp)
            out = sfconv_freq_pallas_v4(x, wp, True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
        x, wp = self._pair(2, 8, 8, 6)
        cot = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 8, 8, 6)).astype(np.float32))
        gx_r, gw_r = jax.grad(
            lambda x, wp: jnp.sum(sfconv_freq_spatial(x, wp) * cot),
            argnums=(0, 1))(x, wp)
        gx_p, gw_p = jax.grad(
            lambda x, wp: jnp.sum(sfconv_freq_pallas_v4(x, wp, True) * cot),
            argnums=(0, 1))(x, wp)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   rtol=1e-3, atol=1e-3)

    def test_row_tile_divides(self):
        from unidefense_tpu.ops.sfconv_pallas import _row_tile

        for h, w in [(48, 48), (24, 24), (95, 95), (12, 12), (16, 16), (7, 3)]:
            r = _row_tile(h, w)
            assert h % r == 0 and r * w <= 512 or r == 1
