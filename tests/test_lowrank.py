import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu.core import lowrank


def test_exact_recovery_of_low_rank_matrix(rng):
    """A matrix of true rank r is recovered (near) exactly."""
    b, h, s, d, r = 2, 3, 64, 32, 4
    u = rng.standard_normal((b, h, s, r)).astype(np.float32)
    v = rng.standard_normal((b, h, r, d)).astype(np.float32)
    x = jnp.asarray(u @ v)
    p, q = lowrank.power_iterate(x, rank=r, n_iter=6, key=jax.random.PRNGKey(1))
    rec = lowrank.reconstruct(p, q)
    rel = float(jnp.linalg.norm(x - rec) / jnp.linalg.norm(x))
    assert rel < 2e-2, rel


def test_shapes_and_orthonormal_q(rng):
    x = jnp.asarray(rng.standard_normal((2, 2, 48, 16)).astype(np.float32))
    p, q = lowrank.power_iterate(x, rank=3, n_iter=3)
    assert p.shape == (2, 2, 16, 3)
    assert q.shape == (2, 2, 48, 3)
    qtq = np.asarray(jnp.swapaxes(q, -1, -2) @ q)
    np.testing.assert_allclose(qtq, np.broadcast_to(np.eye(3), qtq.shape), atol=1e-4)


def test_rank_r_beats_rank_1(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 64, 64)).astype(np.float32))
    def err(r):
        rec = lowrank.low_rank_residual(x, r, 4)
        return float(jnp.linalg.norm(x - rec))
    assert err(8) < err(2) < err(1) < float(jnp.linalg.norm(x))


def test_matches_svd_optimum_loosely(rng):
    """Power iteration with QR approaches the SVD truncation error."""
    x_np = rng.standard_normal((32, 24)).astype(np.float32)
    x = jnp.asarray(x_np)[None, None]
    r = 4
    rec = lowrank.low_rank_residual(x, r, 8)
    err_pi = float(jnp.linalg.norm(x - rec))
    u, s, vt = np.linalg.svd(x_np, full_matrices=False)
    err_svd = float(np.linalg.norm(x_np - (u[:, :r] * s[:r]) @ vt[:r]))
    assert err_pi <= err_svd * 1.2 + 1e-4


def test_jit_compatible():
    x = jnp.ones((1, 1, 16, 8))
    f = jax.jit(lambda t: lowrank.low_rank_residual(t, 2, 3))
    out = f(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_invalid_args():
    x = jnp.ones((1, 1, 8, 8))
    with pytest.raises(ValueError):
        lowrank.power_iterate(x, rank=0, n_iter=3)
    with pytest.raises(ValueError):
        lowrank.power_iterate(x, rank=2, n_iter=0)


def test_thin_qr_q_orthonormal_and_matches_reconstruction():
    """The unrolled Gram-Schmidt (rank<=8 fast path, r5) must produce
    orthonormal columns and a reconstruction identical to the Householder
    QR route up to sign-invariant products."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((2, 3, 64, 4)).astype(np.float32))
    q = lowrank._thin_qr_q(a)
    gram = np.asarray(jnp.einsum("...si,...sj->...ij", q, q))
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(4), gram.shape),
                               atol=1e-5)
    # projector equality vs numpy QR (sign-invariant): Q Q^T == Qh Qh^T
    qh = np.linalg.qr(np.asarray(a))[0]
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("...si,...ti->...st", q, q)),
        np.einsum("...si,...ti->...st", qh, qh), atol=1e-4)


def test_thin_qr_q_rank_deficient_is_finite():
    """Duplicate/zero columns must not produce NaN/Inf (eps-guarded norm);
    the degenerate columns contribute ~nothing to Q P^T."""
    col = np.random.default_rng(4).standard_normal((1, 1, 32, 1))
    a = jnp.asarray(np.concatenate([col, col, np.zeros_like(col)],
                                   axis=-1).astype(np.float32))
    q = np.asarray(lowrank._thin_qr_q(a))
    assert np.isfinite(q).all()
    # first column is unit-norm; later (dependent) columns ~0 or orthogonal
    n0 = np.linalg.norm(q[..., 0], axis=-1)
    np.testing.assert_allclose(n0, 1.0, atol=1e-5)
