"""Block-arrow solver + Pallas inverse kernel + sparse-LU A/B tests.

Covers the tot-mechanism stage solver (block_solver.py), the batched
no-pivot inverse kernel (lu_pallas.py, interpret mode on CPU), the
per-cell Rosenbrock failure masking, and the SparseLU-vs-dense A/B the
round-4 advisor asked for.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistra_tpu.chemistry.gas_kernel import GasKernel
from mistra_tpu.chemistry.lu_pallas import batched_inv_nopivot
from mistra_tpu.chemistry.mech import (load_gas_mechanism,
                                       load_multiphase_mechanism)
from mistra_tpu.chemistry import rosenbrock

MECHDIR = "/root/reference/src/mech"


@pytest.fixture(scope="module")
def tot_setup():
    mech = load_multiphase_mechanism(MECHDIR, name="tot")
    kern = GasKernel(mech, dtype=jnp.float64, solver="block")
    rng = np.random.default_rng(0)
    B = 3
    y = jnp.asarray(rng.random((B, mech.nvar)) * 1e-8)
    k = jnp.asarray(rng.random((B, mech.nrxn)) * 1e-3)
    fix = jnp.asarray(rng.random((B, len(mech.fixed))) * 10)
    return mech, kern, y, k, fix


def test_pallas_inverse_interpret():
    """The Pallas no-pivot inverse kernel (interpret mode) vs numpy."""
    rng = np.random.default_rng(2)
    n, m = 192, 23
    a = rng.random((n, m, m)).astype(np.float32) + 4.0 * np.eye(
        m, dtype=np.float32)
    inv = np.asarray(batched_inv_nopivot(
        jnp.asarray(a), use_pallas=True, interpret=True))
    resid = np.einsum("bij,bjk->bik", inv, a) - np.eye(m)
    assert np.abs(resid).max() < 1e-4


def test_block_solve_residual(tot_setup):
    """(ghinv I - J) x = b solved by the block factorization; the
    residual is checked with the exact Jacobian action via jvp."""
    mech, kern, y, k, fix = tot_setup
    B = y.shape[0]
    ghinv = jnp.asarray(np.full(B, 7.3))
    rhs = jnp.asarray(np.random.default_rng(1).random((B, mech.nvar)))

    @jax.jit
    def run(y, rhs):
        ctx = kern.block.assemble(kern.kw_weights(y, k, fix))
        fact = kern.block.prepare(ctx, ghinv)
        x = kern.block.solve(fact, rhs)
        jx = jax.jvp(lambda yy: kern.fun(yy, k, fix), (y,), (x,))[1]
        return ghinv[:, None] * x - jx - rhs

    r = run(y, rhs)
    assert float(jnp.abs(r).max()) < 1e-10


def test_block_vs_dense_integrate(tot_setup):
    """Full Ros3 integration: block-arrow vs dense-LU paths agree."""
    mech, kern, y, k, fix = tot_setup
    kd = GasKernel(mech, dtype=jnp.float64, solver="dense")
    yb, ib = jax.jit(lambda y: kern.integrate(y, k, fix, 2.0))(y)
    yd, idd = jax.jit(lambda y: kd.integrate(y, k, fix, 2.0))(y)
    assert int(ib["n_failed"]) == 0
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yd),
                               rtol=1e-8, atol=1e-22)
    assert np.array_equal(np.asarray(ib["nsteps"]),
                          np.asarray(idd["nsteps"]))


def test_sparse_vs_dense_gas():
    """ADVICE r4: SparseLU path A/B against the dense pivoted path on
    the gas mechanism (stage solves + full integration)."""
    mech = load_gas_mechanism(MECHDIR)
    ks = GasKernel(mech, dtype=jnp.float64, solver="sparse")
    kd = GasKernel(mech, dtype=jnp.float64, solver="dense")
    rng = np.random.default_rng(3)
    B = 4
    y = jnp.asarray(rng.random((B, mech.nvar)) * 1e-8)
    k = jnp.asarray(rng.random((B, mech.nrxn)) * 1e-3)
    fix = jnp.asarray(rng.random((B, len(mech.fixed))) * 10)
    ys, infs = jax.jit(lambda y: ks.integrate(y, k, fix, 2.0))(y)
    yd, infd = jax.jit(lambda y: kd.integrate(y, k, fix, 2.0))(y)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yd),
                               rtol=1e-8, atol=1e-22)


def test_per_cell_failure_masking():
    """One pathologically stiff cell must not stall the others
    (VERDICT r4 weak #1; reference warns per cell, gas.f:764-767)."""
    def fun(y):
        # dy/dt = -lam * y; cell 0's NaN tendency forces an endless
        # rejection loop (the NaN guard treats it as a failed step)
        return -lam[:, None] * y

    class Lin:
        def jac(self, y):
            return -jnp.where(jnp.isfinite(lam), lam,
                              1.0)[:, None, None] * jnp.eye(1)[None]

        def prepare(self, j, ghinv):
            return ghinv[:, None, None] * jnp.eye(1)[None] - j

        def solve(self, fact, rhs):
            return rhs / fact[:, :, 0]

    lam = jnp.asarray([jnp.nan, 1.0, 2.0])
    y0 = jnp.ones((3, 1))
    opts = rosenbrock.RosOptions(max_steps=200)
    y, info = rosenbrock.integrate(fun, Lin(), y0, 10.0, opts)
    failed = np.asarray(info["failed"])
    done_t = np.asarray(info["t"])
    # the two well-behaved cells reach tend even though cell 0 fails
    assert done_t[1] >= 10.0 * (1 - 1e-9)
    assert done_t[2] >= 10.0 * (1 - 1e-9)
    assert not failed[1] and not failed[2]
    assert failed[0] and done_t[0] < 10.0
