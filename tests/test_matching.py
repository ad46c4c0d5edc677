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


def test_refine_matches_recovers_subpixel_shift():
    """Plant a descriptor field and a known integer-pixel offset between
    two images; grid matching snaps to the grid, refine_matches must
    recover the true pixel to <= 0.5 px (hard-argmax accuracy)."""
    import numpy as np
    import jax.numpy as jnp
    from starst3r_tpu.ops.matching import match_pair, refine_matches

    h = w = 64
    d = 16
    sub = 8
    rng = np.random.default_rng(3)
    # two-scale field: low-frequency positional sinusoids guide the GRID
    # match to the right cell; an exact high-frequency noise channel makes
    # the similarity peak sharply at the true pixel so the refinement has
    # a unique argmax (real descriptors have the same two-scale structure)
    yy, xx = np.meshgrid(np.arange(h + 8), np.arange(w + 8), indexing="ij")
    ds = d // 2
    freqs = rng.uniform(0.05, 0.25, size=(ds, 2))
    phases = rng.uniform(0, 2 * np.pi, size=ds)
    smooth = np.sin(yy[..., None] * freqs[:, 0]
                    + xx[..., None] * freqs[:, 1] + phases)
    smooth /= np.linalg.norm(smooth, axis=-1, keepdims=True) + 1e-8
    noise = rng.normal(size=(h + 8, w + 8, d - ds))
    noise /= np.linalg.norm(noise, axis=-1, keepdims=True) + 1e-8
    base = np.concatenate([smooth, 0.4 * noise], -1).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True) + 1e-8
    shift = (1, 1)   # (dy, dx): image2 = image1 translated;
    # small shift keeps the true counterpart well inside its own cell so
    # grid matching lands on the right cell and refinement is exercised
    d1 = base[4:4 + h, 4:4 + w]
    d2 = base[4 - shift[0]:4 - shift[0] + h, 4 - shift[1]:4 - shift[1] + w]
    conf = np.full((h, w), 10.0, np.float32)

    m = match_pair(jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(conf),
                   jnp.asarray(conf), subsample=sub)
    pix1, pix2 = refine_matches(jnp.asarray(d1), jnp.asarray(d2), m,
                                subsample=sub)
    pix1 = np.asarray(pix1)
    pix2 = np.asarray(pix2)
    mask = np.asarray(m.mask)
    # the refinement window is +-subsample/2 around the matched grid
    # point, so it can only correct matches whose grid cell is the one
    # owning the true pixel (cell-off matches are a matcher-quality
    # issue, orthogonal to refinement): keep own-cell interior matches
    idx1 = np.asarray(m.idx1)
    idx2 = np.asarray(m.idx2)
    ws_ = w // sub
    same_cell = idx1 == idx2          # shift < subsample/2 keeps the cell
    interior = (mask & same_cell
                & (pix1[:, 0] > sub) & (pix1[:, 0] < w - sub)
                & (pix1[:, 1] > sub) & (pix1[:, 1] < h - sub)
                & (pix2[:, 0] > sub) & (pix2[:, 0] < w - sub)
                & (pix2[:, 1] > sub) & (pix2[:, 1] < h - sub))
    assert interior.sum() >= 8
    dx = pix2[interior, 0] - pix1[interior, 0]
    dy = pix2[interior, 1] - pix1[interior, 1]
    # d2[y, x] = d1[y - dy0, x - dx0]: a feature of image1 reappears at
    # +shift in image2, so pix2 - pix1 == +(dx0, dy0)
    assert np.median(np.abs(dx - shift[1])) <= 0.5, dx
    assert np.median(np.abs(dy - shift[0])) <= 0.5, dy
