import jax.numpy as jnp
import numpy as np

from mistra_tpu.utils.tridiag import (diffusion_coefficients, implicit_sweep,
                                      subsidence)


def _reference_sweep(xa, xc, rhs, bottom, top):
    """Direct numpy transliteration of the Thomas sweep for testing."""
    n = rhs.shape[0]
    xb = 1.0 + xa + xc
    xe = np.zeros(n)
    xf = np.zeros(n)
    xf[0] = bottom
    for k in range(1, n - 1):
        xd = xb[k] - xc[k] * xe[k - 1]
        xe[k] = xa[k] / xd
        xf[k] = (rhs[k] + xc[k] * xf[k - 1]) / xd
    x = rhs.copy()
    x[0] = bottom
    x[n - 1] = top
    for k in range(n - 2, 0, -1):
        x[k] = xe[k] * x[k + 1] + xf[k]
    return x


def test_matches_reference_recursion():
    rng = np.random.default_rng(0)
    n = 50
    atk = rng.uniform(0.5, 5.0, n)
    detw = rng.uniform(5.0, 20.0, n)
    deta = rng.uniform(5.0, 20.0, n)
    field = rng.uniform(280.0, 300.0, n)
    dt = 10.0

    xa, xc = diffusion_coefficients(jnp.asarray(atk), jnp.asarray(detw),
                                    jnp.asarray(deta), dt)
    got = implicit_sweep(xa, xc, jnp.asarray(field)[:, None])[:, 0]
    want = _reference_sweep(np.asarray(xa), np.asarray(xc), field,
                            field[0], field[-1])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-13)


def test_solves_linear_system():
    """The sweep must actually solve the implicit diffusion linear system."""
    rng = np.random.default_rng(1)
    n = 30
    atk = rng.uniform(0.5, 5.0, n)
    detw = rng.uniform(5.0, 20.0, n)
    deta = rng.uniform(5.0, 20.0, n)
    field = rng.uniform(0.0, 1.0, n)
    dt = 10.0
    xa, xc = diffusion_coefficients(jnp.asarray(atk), jnp.asarray(detw),
                                    jnp.asarray(deta), dt)
    xa_n, xc_n = np.asarray(xa), np.asarray(xc)
    x = np.asarray(implicit_sweep(xa, xc, jnp.asarray(field)[:, None])[:, 0])

    # verify the tridiagonal relation at interior nodes:
    # (1+xa+xc) x_k - xa x_{k+1} - xc x_{k-1} = rhs_k
    for k in range(1, n - 1):
        lhs = (1 + xa_n[k] + xc_n[k]) * x[k] - xa_n[k] * x[k + 1] \
            - xc_n[k] * x[k - 1]
        np.testing.assert_allclose(lhs, field[k], rtol=1e-12)


def test_conserves_uniform_field():
    """A constant profile is a fixed point of pure diffusion."""
    n = 40
    atk = np.linspace(1, 3, n)
    detw = np.full(n, 10.0)
    deta = np.full(n, 10.0)
    const = np.full(n, 42.0)
    xa, xc = diffusion_coefficients(jnp.asarray(atk), jnp.asarray(detw),
                                    jnp.asarray(deta), 10.0)
    out = implicit_sweep(xa, xc, jnp.asarray(const)[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(out), const, rtol=1e-13)


def test_multifield_batch_matches_single():
    rng = np.random.default_rng(2)
    n = 25
    atk = rng.uniform(0.5, 5.0, n)
    detw = rng.uniform(5.0, 20.0, n)
    deta = rng.uniform(5.0, 20.0, n)
    f1 = rng.uniform(0, 1, n)
    f2 = rng.uniform(0, 1, n)
    xa, xc = diffusion_coefficients(jnp.asarray(atk), jnp.asarray(detw),
                                    jnp.asarray(deta), 10.0)
    batch = implicit_sweep(xa, xc, jnp.stack([f1, f2], axis=-1))
    s1 = implicit_sweep(xa, xc, jnp.asarray(f1)[:, None])[:, 0]
    s2 = implicit_sweep(xa, xc, jnp.asarray(f2)[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(batch[:, 0]), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(batch[:, 1]), np.asarray(s2))


def test_subsidence_upwind():
    n = 10
    f = np.linspace(0, 9, n)
    c = np.full(n, 0.1)
    out = subsidence(jnp.asarray(f)[:, None], jnp.asarray(c))[:, 0]
    want = f.copy()
    want[1:-1] = f[1:-1] - 0.1 * (f[2:] - f[1:-1])
    np.testing.assert_allclose(np.asarray(out), want)
