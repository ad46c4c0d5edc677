import jax.numpy as jnp
import numpy as np

from starst3r_tpu.ops.matching import (match_pair, reciprocal_nn,
                                       subsample_grid_indices)


def test_subsample_grid():
    flat, hs, ws = subsample_grid_indices(32, 48, 8)
    assert hs == 4 and ws == 6
    flat = np.asarray(flat)
    assert flat[0] == 4 * 48 + 4  # pixel (4, 4)
    assert len(flat) == 24


def test_reciprocal_nn_identity(rng):
    """Identical descriptor sets must match i <-> i."""
    d = rng.normal(size=(50, 8)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c = np.ones(50, np.float32) * 3.0
    m = reciprocal_nn(jnp.asarray(d), jnp.asarray(d), jnp.asarray(c),
                      jnp.asarray(c))
    assert bool(np.all(np.asarray(m.mask)))
    np.testing.assert_array_equal(np.asarray(m.idx2), np.arange(50))
    np.testing.assert_allclose(np.asarray(m.conf), 3.0, atol=1e-5)


def test_reciprocal_nn_permutation(rng):
    d1 = rng.normal(size=(40, 16)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    perm = rng.permutation(40)
    d2 = d1[perm]
    c = np.ones(40, np.float32)
    m = reciprocal_nn(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(c),
                      jnp.asarray(c))
    # match of i must be position of i in d2
    inv = np.argsort(perm)
    np.testing.assert_array_equal(np.asarray(m.idx2), inv)


def test_reciprocal_nn_rejects_unmatched(rng):
    """A descriptor with no counterpart must fail the mutual check."""
    base = rng.normal(size=(10, 8)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    d1 = base
    d2 = base[:5]  # second image only has half the content
    c1 = np.ones(10, np.float32)
    c2 = np.ones(5, np.float32)
    m = reciprocal_nn(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(c1),
                      jnp.asarray(c2))
    mask = np.asarray(m.mask)
    assert mask[:5].all()
    assert not mask[5:].any()
    assert np.asarray(m.conf)[5:].sum() == 0


def test_match_pair_shapes(rng):
    h, w, d = 32, 32, 8
    desc = rng.normal(size=(h, w, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    conf = np.ones((h, w), np.float32)
    m = match_pair(jnp.asarray(desc), jnp.asarray(desc), jnp.asarray(conf),
                   jnp.asarray(conf), subsample=8)
    assert m.idx1.shape == (16,)
    assert bool(np.all(np.asarray(m.mask)))
