"""Pallas compositing kernels vs the XLA reference path (fwd + VJP).

Runs the kernels in interpret mode on CPU (SURVEY §7.6: "kernel (Pallas vs
jnp/numpy reference impls, fwd+grad, interpret mode on CPU)")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starst3r_tpu.splat.rasterize import rasterize


def _scene(rng, n=96):
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    means[:, 2] += 2.5
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = rng.uniform(0.01, 0.08, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    sh = rng.normal(size=(n, 4, 3)).astype(np.float32) * 0.3
    w2c = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    w2c[1, 0, 3] = 0.15
    K = np.tile(np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                         np.float32)[None], (2, 1, 1))
    return tuple(jnp.asarray(x) for x in (means, quats, scales, opac, sh,
                                          w2c, K))


KW = dict(width=32, height=32, sh_degree=1, tile_size=16,
          max_tiles_per_gaussian=9, max_per_tile=128, chunk=32)


def test_pallas_forward_matches_reference(rng):
    args = _scene(rng)
    rgb_r, a_r, _ = rasterize(*args, impl="ref", **KW)
    rgb_p, a_p, _ = rasterize(*args, impl="pallas", **KW)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_r),
                               atol=1e-4, rtol=1e-4)


def test_pallas_gradients_match_reference(rng):
    args = _scene(rng)
    tgt = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))

    def loss(impl, means, quats, scales, opac, sh):
        rgb, alpha, _ = rasterize(means, quats, scales, opac, sh,
                                  args[5], args[6], impl=impl, **KW)
        return jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(alpha)

    g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 1, 2, 3, 4))(
        *args[:5])
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(
        *args[:5])
    names = ("means", "quats", "scales", "opac", "sh")
    for name, gr, gp in zip(names, g_ref, g_pal):
        gr = np.asarray(gr)
        gp = np.asarray(gp)
        assert np.all(np.isfinite(gp)), name
        scale = np.maximum(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(gp / scale, gr / scale, atol=2e-3,
                                   err_msg=name)


def test_pallas_early_exit_opaque_wall(rng):
    """A fully opaque near Gaussian must occlude everything behind it and
    still produce correct output with the early-exit path."""
    n = 64
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(1.0, 5.0, n)
    means[:, :2] = rng.normal(size=(n, 2)) * 0.01
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 2.0, np.float32)   # huge -> covers the tile
    opac = np.full((n,), 0.999, np.float32)
    sh = np.zeros((n, 4, 3), np.float32)
    sh[0, 0] = (np.array([1.0, 0.0, 0.0]) - 0.5) / 0.28209479177387814
    w2c = jnp.eye(4)[None]
    K = jnp.asarray(np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                             np.float32))[None]
    args = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), w2c, K)
    rgb_r, a_r, _ = rasterize(*args, impl="ref", **KW)
    rgb_p, a_p, _ = rasterize(*args, impl="pallas", **KW)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_r),
                               atol=1e-3)
    # nearest gaussian is red and opaque -> center pixel is red
    assert float(rgb_p[0, 16, 16, 0]) > 0.8
    assert float(a_p[0, 16, 16, 0]) > 0.99


def test_xla_custom_vjp_matches_reference(rng):
    """The analytic reverse-sweep VJP (impl='xla', the default) must match
    the autodiff oracle (impl='ref') in both forward and gradients."""
    args = _scene(rng)
    rgb_r, a_r, _ = rasterize(*args, impl="ref", **KW)
    rgb_x, a_x, _ = rasterize(*args, impl="xla", **KW)
    np.testing.assert_allclose(np.asarray(rgb_x), np.asarray(rgb_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a_x), np.asarray(a_r),
                               atol=1e-5, rtol=1e-5)

    tgt = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))

    def loss(impl, means, quats, scales, opac, sh):
        rgb, alpha, _ = rasterize(means, quats, scales, opac, sh,
                                  args[5], args[6], impl=impl, **KW)
        return jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(alpha)

    g_ref = jax.grad(lambda *a: loss("ref", *a), argnums=(0, 1, 2, 3, 4))(
        *args[:5])
    g_xla = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4))(
        *args[:5])
    for name, gr, gx in zip(("means", "quats", "scales", "opac", "sh"),
                            g_ref, g_xla):
        gr = np.asarray(gr)
        gx = np.asarray(gx)
        assert np.all(np.isfinite(gx)), name
        scale = np.maximum(np.abs(gr).max(), 1e-6)
        np.testing.assert_allclose(gx / scale, gr / scale, atol=1e-3,
                                   err_msg=name)


def test_pallas_multichunk_matches_reference(rng):
    """Dense scene forcing MULTIPLE 128-entry chunks per tile (the
    compiled-mode failure at bench scale was absent at single-chunk
    scale): fwd + grads vs the XLA analytic path."""
    args = _scene(rng, n=1400)
    kw = dict(width=32, height=32, sh_degree=1, tile_size=16,
              max_tiles_per_gaussian=4, max_per_tile=512, chunk=128)
    rgb_r, a_r, _ = rasterize(*args, impl="xla", **kw)
    rgb_p, a_p, _ = rasterize(*args, impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_r),
                               atol=1e-4, rtol=1e-4)

    def loss(impl, means):
        rgb, alpha, _ = rasterize(means, *args[1:5], args[5], args[6],
                                  impl=impl, **kw)
        return jnp.sum(rgb * rgb) + jnp.sum(alpha)

    g_r = jax.grad(lambda m: loss("xla", m))(args[0])
    g_p = jax.grad(lambda m: loss("pallas", m))(args[0])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               atol=5e-3, rtol=1e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-mode Pallas parity needs real TPU")
def test_pallas_compiled_mode_matches_reference(rng):
    """COMPILED-mode (not interpret) Pallas-vs-XLA parity on real TPU
    hardware (ADVICE r4: the dynamic-lane-slice bug class the multichunk
    test guards against only manifests in compiled mode — CPU interpret
    CI cannot catch its regression). Run by the verify flow / any TPU
    pytest invocation; skipped everywhere else."""
    args = _scene(rng, n=1400)
    kw = dict(width=32, height=32, sh_degree=1, tile_size=16,
              max_tiles_per_gaussian=4, max_per_tile=512, chunk=128)
    rgb_r, a_r, _ = rasterize(*args, impl="xla", **kw)
    rgb_p, a_p, _ = rasterize(*args, impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_r),
                               atol=1e-4, rtol=1e-4)

    def loss(impl, means):
        rgb, alpha, _ = rasterize(means, *args[1:5], args[5], args[6],
                                  impl=impl, **kw)
        return jnp.sum(rgb * rgb) + jnp.sum(alpha)

    g_r = jax.grad(lambda m: loss("xla", m))(args[0])
    g_p = jax.grad(lambda m: loss("pallas", m))(args[0])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               atol=5e-3, rtol=1e-3)
