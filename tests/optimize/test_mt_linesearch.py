"""Golden parity for the batched Moré–Thuente line search (_mt_search).

The golden below is a scalar numpy port of the reference's per-config
dcsrch (nablaDFT/optimization/line_search.py: _line_search driver :13-124,
step :126-342, update :343-489, determine_step/determine_step_ :490-507),
following its control flow statement by statement. The test runs both on a
batch of synthetic anharmonic potentials and asserts the accepted step of
every config matches.
"""

import math

import jax
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.optimize.lbfgs import LBFGSState, _mt_search, lbfgs_relax

pytestmark = pytest.mark.optimization

C1, C2 = 0.23, 0.46  # reference optimizers.py:654-655
MAXSTEP = 0.2
XTOL = 1e-14
XTRAPL, XTRAPU = 1.1, 4.0
STPMIN, STPMAX = 1e-8, 50.0


# ---------------------------------------------------------------------------
# scalar reference dcsrch (numpy port of line_search.py)
# ---------------------------------------------------------------------------


def _golden_update(state, stp, fp, gp, stpmin, stpmax, bracket):
    """line_search.py:343-489 (returns stx..gy, stpf, bracket)."""
    stx, fx, gx, sty, fy, gy = state
    sign = gp * (gx / abs(gx))
    if fp > fx:
        theta = 3.0 * (fx - fp) / (stp - stx) + gx + gp
        s = max(abs(theta), abs(gx), abs(gp))
        gamma = s * math.sqrt((theta / s) ** 2 - (gx / s) * (gp / s))
        if stp < stx:
            gamma = -gamma
        p = (gamma - gx) + theta
        q = ((gamma - gx) + gamma) + gp
        r = p / q
        stpc = stx + r * (stp - stx)
        stpq = stx + ((gx / ((fx - fp) / (stp - stx) + gx)) / 2.0) * (stp - stx)
        if abs(stpc - stx) < abs(stpq - stx):
            stpf = stpc
        else:
            stpf = stpc + (stpq - stpc) / 2.0
        bracket = True
    elif sign < 0:
        theta = 3.0 * (fx - fp) / (stp - stx) + gx + gp
        s = max(abs(theta), abs(gx), abs(gp))
        gamma = s * math.sqrt((theta / s) ** 2 - (gx / s) * (gp / s))
        if stp > stx:
            gamma = -gamma
        p = (gamma - gp) + theta
        q = ((gamma - gp) + gamma) + gx
        r = p / q
        stpc = stp + r * (stx - stp)
        stpq = stp + (gp / (gp - gx)) * (stx - stp)
        stpf = stpc if abs(stpc - stp) > abs(stpq - stp) else stpq
        bracket = True
    elif abs(gp) < abs(gx):
        theta = 3.0 * (fx - fp) / (stp - stx) + gx + gp
        s = max(abs(theta), abs(gx), abs(gp))
        gamma = s * math.sqrt(max(0.0, (theta / s) ** 2 - (gx / s) * (gp / s)))
        if stp > stx:
            gamma = -gamma
        p = (gamma - gp) + theta
        q = (gamma + (gx - gp)) + gamma
        r = p / q
        if r < 0.0 and gamma != 0:
            stpc = stp + r * (stx - stp)
        elif stp > stx:
            stpc = stpmax
        else:
            stpc = stpmin
        stpq = stp + (gp / (gp - gx)) * (stx - stp)
        if bracket:
            stpf = stpc if abs(stpc - stp) < abs(stpq - stp) else stpq
            if stp > stx:
                stpf = min(stp + 0.66 * (sty - stp), stpf)
            else:
                stpf = max(stp + 0.66 * (sty - stp), stpf)
        else:
            stpf = stpc if abs(stpc - stp) > abs(stpq - stp) else stpq
            stpf = min(stpmax, stpf)
            stpf = max(stpmin, stpf)
    else:
        if bracket:
            theta = 3.0 * (fp - fy) / (sty - stp) + gy + gp
            s = max(abs(theta), abs(gy), abs(gp))
            gamma = s * math.sqrt((theta / s) ** 2 - (gy / s) * (gp / s))
            if stp > sty:
                gamma = -gamma
            p = (gamma - gp) + theta
            q = ((gamma - gp) + gamma) + gy
            stpf = stp + (p / q) * (sty - stp)
        elif stp > stx:
            stpf = stpmax
        else:
            stpf = stpmin

    if fp > fx:
        sty, fy, gy = stp, fp, gp
    else:
        if sign < 0:
            sty, fy, gy = stx, fx, gx
        stx, fx, gx = stp, fp, gp
    return (stx, fx, gx, sty, fy, gy), stpf, bracket


def golden_mt(phi, dphi, p_atoms, maxstep=MAXSTEP, c1=C1, c2=C2,
              max_abs_step=100):
    """Reference _line_search semantics for ONE config over scalar callables
    φ(α), φ'(α); p_atoms [A,3] is the search direction (for the per-trial
    maxstep delta cap and the final determine_step_ override)."""
    p_maxlen = float(np.max(np.sqrt((p_atoms**2).sum(-1))))

    def determine_step(stp_new, stp_old):
        d = stp_new - stp_old
        if abs(d) * p_maxlen >= maxstep:
            d = math.copysign(maxstep / p_maxlen, d)
        return stp_old + d

    def determine_step_():
        return maxstep / p_maxlen if p_maxlen >= maxstep else 1.0

    phi0, derphi0 = phi(0.0), dphi(0.0)
    if derphi0 >= 0:
        return determine_step_(), 0  # ERROR branch -> no_update override

    # START (line_search.py:127-192)
    bracket = False
    finit, ginit = phi0, derphi0
    gtest = c1 * ginit
    width = STPMAX - STPMIN
    width1 = width / 0.5
    interval = (0.0, finit, ginit, 0.0, finit, ginit)  # stx fx gx sty fy gy
    stmin, stmax = 0.0, 1.0 + XTRAPU * 1.0
    stp = determine_step(1.0, 0.0)
    old_stp = 0.0

    for it in range(1, max_abs_step + 1):
        fp, gp = phi(stp), dphi(stp)
        ftest = finit + stp * gtest
        warn = (
            (bracket and (stp <= stmin or stp >= stmax))
            or (bracket and stmax - stmin <= XTOL * stmax)
            or (stp == STPMAX and fp <= ftest and gp <= gtest)
            or (stp == STPMIN and (fp > ftest or gp >= gtest))
        )
        conv = fp <= ftest and abs(gp) <= c2 * (-ginit)
        if warn or conv:
            # caller override, line_search.py:104-107
            return determine_step_(), it
        interval, stpf, bracket = _golden_update(
            interval, stp, fp, gp, stmin, stmax, bracket
        )
        stx, _, _, sty, _, _ = interval
        new_stp = determine_step(stpf, stp)
        if bracket and abs(sty - stx) >= 0.66 * width1:
            new_stp = stx + 0.5 * (sty - stx)
        if bracket:
            width1 = width
            width = abs(sty - stx)
        if bracket:
            stmin, stmax = min(stx, sty), max(stx, sty)
        else:
            stmin = new_stp + XTRAPL * (new_stp - stx)
            stmax = new_stp + XTRAPU * (new_stp - stx)
        new_stp = max(min(new_stp, STPMAX), STPMIN)
        # reference precedence (line_search.py:314): the stp >= stmax reset
        # applies even unbracketed
        if ((bracket and new_stp < stmin) or new_stp >= stmax) or (
            bracket and stmax - stmin < XTOL * stmax
        ):
            new_stp = stx
        old_stp, stp = stp, new_stp
    return stp, max_abs_step


# ---------------------------------------------------------------------------
# batched synthetic potentials
# ---------------------------------------------------------------------------


def _make_problem(rng, b=6, a=4):
    """Per-config anharmonic wells E = Σ k|x-x*|² + q|x-x*|⁴ with varied
    stiffness so the accepted steps differ per lane."""
    x_star = rng.normal(size=(b, a, 3)).astype(np.float64)
    k = rng.uniform(0.5, 8.0, size=(b, 1, 1))
    q = rng.uniform(0.0, 2.0, size=(b, 1, 1))
    pos0 = x_star + rng.normal(size=(b, a, 3)) * rng.uniform(0.2, 1.2, (b, 1, 1))

    def ef(pos):
        d = pos - x_star
        r2 = (d * d).sum(-1, keepdims=True)
        e = (k * r2 + q * r2 * r2)[..., 0].sum(-1)
        f = -(2 * k + 4 * q * r2) * d
        return e, f

    return pos0.astype(np.float64), ef


def test_mt_search_matches_reference_dcsrch(rng):
    b, a = 6, 4
    pos0, ef = _make_problem(rng, b, a)
    e0, f0 = ef(pos0)
    # descent directions: preconditioned steepest descent with assorted
    # scales, incl. one deliberately huge (exercises the maxstep delta cap)
    scales = np.array([1.0, 0.1, 3.0, 20.0, 0.5, 1.0])[:, None, None]
    p = f0 * scales  # descent: derphi0 = -|f|²·scale < 0

    node_mask = np.ones((b, a), bool)
    st = LBFGSState(
        pos=pos0, energy=e0, forces=f0, r0=pos0, f0=f0,
        s_hist=np.zeros((1, b, a, 3)), y_hist=np.zeros((1, b, a, 3)),
        rho=np.zeros((1, b)), iteration=np.zeros((), np.int32),
        converged=np.zeros((b,), bool), nsteps_to_converge=np.zeros((b,), np.int32),
    )

    def compute(pos):
        e, f = ef(pos)
        return e, f

    steps, _ = _mt_search(compute, st, p.astype(np.float64), node_mask,
                          C1, C2, MAXSTEP, 100)
    steps = np.asarray(steps)

    for i in range(b):
        def phi(alpha, i=i):
            e, _ = ef(pos0 + np.where(np.arange(b)[:, None, None] == i, alpha, 0.0) * p)
            return float(e[i])

        def dphi(alpha, i=i):
            _, f = ef(pos0 + np.where(np.arange(b)[:, None, None] == i, alpha, 0.0) * p)
            return float(-(f[i] * p[i]).sum())

        want, n_evals = golden_mt(phi, dphi, p[i])
        assert n_evals < 100, f"golden did not terminate for lane {i}"
        np.testing.assert_allclose(
            steps[i], want, rtol=1e-6, atol=1e-10,
            err_msg=f"lane {i} (accepted after {n_evals} evals)",
        )


def test_mt_far_minimizer_small_direction(rng):
    """The dcstep extrapolation must be bounded by the EVOLVING
    stmin/stmax window (xtrapl/xtrapu), not the global step limits: a lane
    with a small-norm direction (the maxstep delta cap never binds) and a
    far minimizer must walk out via the same trial sequence as the
    reference (1 → ~5 → ~21 → ...), not jump straight to the minimizer."""
    b, a = 1, 4
    x_star = np.zeros((b, a, 3))
    k = np.full((b, 1, 1), 1.0)

    def ef(pos):
        d = pos - x_star
        e = (k[..., 0] * (d * d).sum(-1)).sum(-1)
        f = -2 * k * d
        return e, f

    pos0 = rng.normal(size=(b, a, 3))
    e0, f0 = ef(pos0)
    p = f0 * 0.025  # small norm: minimizer along p at alpha = 40
    node_mask = np.ones((b, a), bool)
    st = LBFGSState(
        pos=pos0, energy=e0, forces=f0, r0=pos0, f0=f0,
        s_hist=np.zeros((1, b, a, 3)), y_hist=np.zeros((1, b, a, 3)),
        rho=np.zeros((1, b)), iteration=np.zeros((), np.int32),
        converged=np.zeros((b,), bool), nsteps_to_converge=np.zeros((b,), np.int32),
    )
    steps, iters = _mt_search(lambda pos: ef(pos), st, p, node_mask,
                              C1, C2, MAXSTEP, 100)

    def phi(alpha):
        e, _ = ef(pos0 + alpha * p)
        return float(e[0])

    def dphi(alpha):
        _, f = ef(pos0 + alpha * p)
        return float(-(f[0] * p[0]).sum())

    want, n_evals = golden_mt(phi, dphi, p[0])
    assert n_evals > 1, "problem too easy to discriminate trial sequences"
    assert int(iters) == n_evals, (int(iters), n_evals)
    np.testing.assert_allclose(np.asarray(steps)[0], want, rtol=1e-6)


def test_mt_relaxation_converges(rng):
    """End-to-end: lbfgs_relax(line_search='mt') relaxes a synthetic batch
    of harmonic wells to fmax on every lane (incl. a padded one)."""
    b, a = 4, 4
    rng2 = np.random.default_rng(7)
    x_star = rng2.normal(size=(b, a, 3)).astype(np.float32)
    k = rng2.uniform(0.5, 8.0, size=(b, 1, 1)).astype(np.float32)

    import jax.numpy as jnp

    def ef_jax(batch: MolBatch):
        d = batch.pos - x_star
        r2 = (d * d).sum(-1, keepdims=True)
        e = (k * r2)[..., 0].sum(-1)
        f = -(2 * k) * d
        return e, f

    graph_mask = np.array([True, True, True, False])
    batch = MolBatch(
        z=np.ones((b, a), np.int32), pos=rng2.normal(size=(b, a, 3)).astype(np.float32),
        node_mask=np.ones((b, a), bool), graph_mask=graph_mask,
        energy=None, forces=None, mol_id=np.arange(b, dtype=np.int32),
    )
    res = lbfgs_relax(
        ef_jax, batch, fmax=0.01, max_steps=200, memory=10,
        line_search="mt", ls_c1=C1, ls_c2=C2,
    )
    assert bool(np.all(np.asarray(res.converged)[graph_mask])), np.asarray(res.converged)
    final_f = np.asarray(res.forces)
    fmaxes = np.sqrt((final_f**2).sum(-1)).max(-1)
    assert np.all(fmaxes[graph_mask] < 0.01)
