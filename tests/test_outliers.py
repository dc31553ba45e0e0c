import numpy as np
import jax.numpy as jnp

from gear_tpu.core import outliers


def test_extract_restore_roundtrip(rng):
    x = rng.standard_normal((3, 4, 32)).astype(np.float32)
    cleaned, rec = outliers.extract(jnp.asarray(x), k=3)
    restored = outliers.restore(cleaned, rec)
    np.testing.assert_allclose(np.asarray(restored), x, rtol=1e-6)


def test_extremes_replaced_by_mean(rng):
    x = rng.standard_normal((2, 64)).astype(np.float32)
    cleaned, rec = outliers.extract(jnp.asarray(x), k=2)
    c = np.asarray(cleaned)
    for row in range(2):
        mean = x[row].mean()
        order = np.argsort(x[row])
        for idx in np.concatenate([order[:2], order[-2:]]):
            np.testing.assert_allclose(c[row, idx], mean, rtol=1e-5)
    # Non-outlier positions untouched.
    mask = np.ones_like(x, bool)
    for row in range(2):
        order = np.argsort(x[row])
        mask[row, order[:2]] = False
        mask[row, order[-2:]] = False
    np.testing.assert_allclose(c[mask], x[mask], rtol=1e-6)


def test_k_zero_is_identity(rng):
    x = rng.standard_normal((2, 16)).astype(np.float32)
    cleaned, rec = outliers.extract(jnp.asarray(x), k=0)
    np.testing.assert_array_equal(np.asarray(cleaned), x)
    restored = outliers.restore(cleaned, rec)
    np.testing.assert_array_equal(np.asarray(restored), x)


def test_outlier_k_formula():
    # reference: int(total * sparsity) / rows / 2 (compress_function.py:227-229)
    assert outliers.outlier_k(1 * 8 * 100 * 64, 1 * 100, 0.02) == int(
        int(1 * 8 * 100 * 64 * 0.02) / 100 / 2
    )
    assert outliers.outlier_k(1000, 10, 0.0) == 0


def test_clamped_range_after_extraction(rng):
    """After removing k extremes, the dynamic range per row shrinks."""
    x = rng.standard_normal((4, 256)).astype(np.float32)
    x[:, 0] = 100.0  # plant a huge outlier
    cleaned, _ = outliers.extract(jnp.asarray(x), k=4)
    c = np.asarray(cleaned)
    assert c.max() < 50.0
    assert (c.max(axis=1) - c.min(axis=1) < x.max(axis=1) - x.min(axis=1)).all()
