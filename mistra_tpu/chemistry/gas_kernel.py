"""Gas-phase chemistry kernel: mechanism arrays -> batched fun/jac/rates.

Replaces the KPP-generated ``Update_RCONST_g``/``Fun_g``/``Jac_SP_g``
(gas.f:275-709, 2043-2655) with mechanism-as-data: rate expressions are
evaluated once at trace time against the vectorized rate library, species
production/loss and the dense Jacobian are MXU matmuls against the packed
stoichiometry, and the Ros3 integrator advances all (layer, column) cells
in one masked batch.

Concentration units: mol/m3 (the reference's transport unit; bimolecular
rate expressions carry the CONV1 factor in the mechanism file).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mech import MAX_REACTANTS, Mechanism
from .rates import RateEnv, make_namespace
from . import rosenbrock


class GasKernel:
    # mechanisms up to this size use the unrolled static-sparse LU
    # (the trace-unrolled KppDecomp/KppSolve form); larger binned
    # mechanisms (tot: nvar=421, an unrolled schedule would be ~350k
    # traced ops) use the block-arrow dense solver with the Pallas
    # batched-inverse kernel (block_solver.py)
    SPARSE_NVAR_MAX = 300

    def __init__(self, mech: Mechanism, dtype=jnp.float64,
                 use_sparse: bool | None = None,
                 solver: str | None = None):
        self.mech = mech
        self.dtype = dtype
        self.nvar = mech.nvar
        self.nfix = len(mech.fixed)
        self.stoich = jnp.asarray(mech.stoich, dtype)       # [nrxn, nvar]
        self.ridx = jnp.asarray(mech.ridx)                  # [nrxn, 3]
        # per-slot one-hot for the Jacobian scatter (zero rows for fixed)
        oh = []
        ohx = []
        nex = mech.nvar + 1 + len(mech.fixed)
        for l in range(MAX_REACTANTS):
            col = mech.ridx[:, l]
            m = np.zeros((mech.nrxn, mech.nvar))
            valid = col < mech.nvar
            m[np.nonzero(valid)[0], col[valid]] = 1.0
            oh.append(m)
            mx = np.zeros((mech.nrxn, nex))
            mx[np.arange(mech.nrxn), col] = 1.0
            ohx.append(mx)
        self.onehot = jnp.asarray(np.stack(oh), dtype)      # [3, nrxn, nvar]
        # one-hot over the extended concentration vector (vars + 1 + fix)
        # so reactant gathers become MXU matmuls for large mechanisms
        self.onehot_cx = jnp.asarray(np.stack(ohx), dtype)  # [3, nrxn, nex]
        sb = getattr(mech, "species_bin", None)
        binned = sb is not None and bool(np.any(np.asarray(sb) > 0))
        if solver is None:
            if use_sparse is True:
                solver = "sparse"
            elif use_sparse is False:
                solver = "dense"
            elif binned:
                # any binned (aer/tot) mechanism: block-arrow dense
                # solver — the unrolled sparse schedule would be 80k+
                # traced ops even at aer size
                solver = "block"
            elif mech.nvar <= self.SPARSE_NVAR_MAX:
                solver = "sparse"
            else:
                solver = "dense"
        self.solver = solver
        self.slu = None
        self.block = None
        # reactant products via matmul one-hots (MXU) instead of
        # cx[:, ridx] gathers for the big mechanisms
        self.matmul_gather = solver == "block"
        if solver == "sparse":
            from .sparse_lu import (SparseLU, jac_pattern_from_mech,
                                    sparse_jac_terms)
            self.slu = SparseLU(jac_pattern_from_mech(mech), mech.nvar)
            self._jac_terms = sparse_jac_terms(mech, self.slu)
        elif solver == "block":
            from .block_solver import BlockArrowSolver
            self.block = BlockArrowSolver(mech, dtype=dtype)

    # ------------------------------------------------------------------
    def rate_constants(self, env: RateEnv, fix=None) -> jnp.ndarray:
        """Evaluate all rate expressions -> k [..., nrxn].

        env fields may be scalars or batched arrays; the result broadcasts.
        fix: [..., nfix] fixed-species concentrations (FIX(indf_*) refs).
        """
        ns = make_namespace(env)
        ns.setdefault("fdhetg", lambda na, nb: 0.0)
        ns.setdefault("yxkmt", lambda ind, a: 0.0)
        ns.setdefault("ycw", lambda a: 0.0)
        # no aerosol environment bound: het-on-dry-aerosol switched off
        ns.setdefault("xhet1", 0.0)
        ns.setdefault("xhet2", 0.0)
        if fix is not None:
            ns["fix"] = lambda i: fix[..., i]
            for fi, name in enumerate(self.mech.fixed):
                ns[f"indf_{name.lower()}"] = fi
        ks = []
        zero = env.te * 0.0
        for rx in self.mech.reactions:
            try:
                k = eval(rx.rate_expr, {"__builtins__": {}}, ns)
            except Exception as exc:
                raise RuntimeError(
                    f"rate expression for {rx.label} failed: "
                    f"{rx.rate_expr!r}: {exc}") from exc
            ks.append(jnp.asarray(k, self.dtype) + zero)
        return jnp.stack(ks, axis=-1)

    # ------------------------------------------------------------------
    def _cx(self, y, fix):
        """Extended concentration vector [B, nvar+1+nfix]."""
        B = y.shape[0]
        ones = jnp.ones((B, 1), y.dtype)
        return jnp.concatenate([y, ones, fix], axis=-1)

    def _cr(self, cx):
        """Reactant concentrations per slot [B, nrxn, 3]."""
        if self.matmul_gather:
            prec = jax.lax.Precision.HIGHEST
            cr = jnp.einsum("bn,lrn->brl", cx, self.onehot_cx,
                            precision=prec)
            return cr
        return cx[:, self.ridx]

    def fun(self, y, k, fix):
        """Tendencies [B, nvar] for concentrations y [B, nvar]."""
        cx = self._cx(y, fix)
        cr = self._cr(cx)                            # [B, nrxn, 3]
        r = k * jnp.prod(cr, axis=-1)                # [B, nrxn]
        if self.matmul_gather:
            return jnp.einsum("br,rs->bs", r, self.stoich,
                              precision=jax.lax.Precision.HIGHEST)
        return r @ self.stoich                       # [B, nvar]

    def reaction_rates(self, y, k, fix):
        """Per-reaction mass-action rates [B, nrxn] (mol/m3/s), the
        quantity the reference budget files record (bud_g.f A(i)=RCT*...)."""
        cx = self._cx(y, fix)
        cr = self._cr(cx)
        return k * jnp.prod(cr, axis=-1)

    def jac(self, y, k, fix):
        """Dense Jacobian [B, nvar, nvar]."""
        cx = self._cx(y, fix)
        cr = cx[:, self.ridx]                        # [B, nrxn, 3]
        p0, p1, p2 = cr[..., 0], cr[..., 1], cr[..., 2]
        wo = jnp.stack([p1 * p2, p0 * p2, p0 * p1])  # [3, B, nrxn]
        jac = jnp.zeros((y.shape[0], self.nvar, self.nvar), y.dtype)
        for l in range(MAX_REACTANTS):
            kw = k * wo[l]                           # [B, nrxn]
            # J[b, s, m] = sum_j stoich[j, s] * kw[b, j] * [ridx(j,l) == m]
            jac = jac + jnp.einsum("js,bj,jm->bsm", self.stoich, kw,
                                   self.onehot[l])
        return jac

    def jac_slot_values(self, y, k, fix):
        """Jacobian values per LU slot (permuted order) for the sparse
        path: list of [B] arrays (fill-in slots are constant zero)."""
        cx = self._cx(y, fix)
        cr = cx[:, self.ridx]                        # [B, nrxn, 3]
        p0, p1, p2 = cr[..., 0], cr[..., 1], cr[..., 2]
        kw = (k * p1 * p2, k * p0 * p2, k * p0 * p1)  # per-slot weights
        zero = jnp.zeros(y.shape[:1], y.dtype)
        vals = []
        for s in range(self.slu.nnz):
            terms = self._jac_terms[s]
            if not terms:
                vals.append(zero)
                continue
            acc = None
            for (l, r, coeff) in terms:
                t = kw[l][:, r] if coeff == 1.0 else coeff * kw[l][:, r]
                acc = t if acc is None else acc + t
            vals.append(acc)
        return vals

    def kw_weights(self, y, k, fix):
        """Per-slot Jacobian weights kwcat [B, 3*nrxn]:
        kw_l[r] = k_r * product of the other reactant concentrations
        (the quantity every Jacobian entry is linear in)."""
        cx = self._cx(y, fix)
        cr = self._cr(cx)                            # [B, nrxn, 3]
        p0, p1, p2 = cr[..., 0], cr[..., 1], cr[..., 2]
        return jnp.concatenate(
            [k * p1 * p2, k * p0 * p2, k * p0 * p1], axis=-1)

    # ------------------------------------------------------------------
    def integrate(self, y0, k, fix, dt,
                  opts: rosenbrock.RosOptions = rosenbrock.RosOptions()):
        """Advance the batch of cells by dt seconds."""
        fun = lambda y: self.fun(y, k, fix)
        if self.solver == "sparse":
            linop = rosenbrock.SparseLinOp(
                lambda y: self.jac_slot_values(y, k, fix),
                self.slu, self.nvar)
        elif self.solver == "block":
            solver = self.block
            jac_fn = lambda y: solver.assemble(self.kw_weights(y, k, fix))
            linop = _BoundBlockLinOp(solver, jac_fn)
        else:
            linop = rosenbrock.DenseLinOp(
                lambda y: self.jac(y, k, fix), self.nvar, self.dtype)
        return rosenbrock.integrate(fun, linop, y0, dt, opts)


class _BoundBlockLinOp:
    """BlockArrowSolver bound to a Jacobian-assembly closure."""

    def __init__(self, solver, jac_fn):
        self._solver = solver
        self._jac = jac_fn

    def jac(self, y):
        return self._jac(y)

    def prepare(self, ctx, ghinv):
        return self._solver.prepare(ctx, ghinv)

    def solve(self, fact, rhs):
        return self._solver.solve(fact, rhs)


# --------------------------------------------------------------------------
# species registry (gas_species.csv compatibility)
# --------------------------------------------------------------------------

def load_species_csv(path: str):
    """Parse the reference's gas species CSV (utils.f90 mk_interface input).

    Returns list of dicts: index, name, mass [kg/mol], ground/top mixing
    ratio [ppb], emission rate [molec/cm2/s].
    """
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("!"):
                continue
            toks = line.split()
            if len(toks) < 6:
                continue
            try:
                out.append({
                    "index": int(toks[0]),
                    "name": toks[1],
                    "mass": float(toks[2].replace("E", "e")),
                    "ground_ppb": float(toks[3]),
                    "top_ppb": float(toks[4]),
                    "emission": float(toks[5]),
                })
            except ValueError:
                continue
    return out
