"""On-device L-BFGS: convergence on analytic surfaces + parity behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.optimize.lbfgs import lbfgs_relax
from nabladft_tpu.optimize.md import kinetic_temperature, normal_modes, run_md

pytestmark = pytest.mark.optimization


def harmonic_ef(k=1.0, r0=1.5):
    """Pairwise harmonic bonds between all real atoms: analytic minimum."""

    def fn(batch):
        pos, mask = batch.pos, batch.node_mask
        diff = pos[:, :, None] - pos[:, None, :]
        pm = mask[:, :, None] & mask[:, None, :] & ~jnp.eye(pos.shape[1], dtype=bool)
        d = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-12)
        e = 0.5 * k * jnp.sum(jnp.where(pm, (d - r0) ** 2, 0.0), axis=(1, 2))

        def esum(p):
            diff = p[:, :, None] - p[:, None, :]
            d = jnp.sqrt(jnp.sum(diff**2, -1) + 1e-12)
            return (0.5 * k * jnp.sum(jnp.where(pm, (d - r0) ** 2, 0.0))), None

        g = jax.grad(lambda p: esum(p)[0])(pos)
        return e, -g * mask[..., None]

    return fn


def make_batch(rng, n_atoms=(3, 4, 2), max_atoms=5):
    B = len(n_atoms) + 1
    z = np.zeros((B, max_atoms), np.int32)
    pos = np.zeros((B, max_atoms, 3), np.float32)
    node_mask = np.zeros((B, max_atoms), bool)
    graph_mask = np.zeros((B,), bool)
    for i, n in enumerate(n_atoms):
        z[i, :n] = 1
        pos[i, :n] = rng.uniform(-1, 1, (n, 3)) * 2
        node_mask[i, :n] = True
        graph_mask[i] = True
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=graph_mask,
        energy=np.zeros(B, np.float32), forces=np.zeros((B, max_atoms, 3), np.float32),
        mol_id=np.arange(B, dtype=np.int32),
    )


def test_lbfgs_converges_on_harmonic(rng):
    batch = make_batch(rng)
    fn = harmonic_ef()
    result = jax.jit(
        lambda b: lbfgs_relax(fn, b, fmax=1e-3, max_steps=300, memory=20)
    )(batch)
    assert bool(np.asarray(result.converged)[:3].all()), np.asarray(result.converged)
    # all bonds at r0 for the 2- and 3-atom systems (exact minima)
    pos = np.asarray(result.pos)
    for b, n in [(0, 3), (2, 2)]:
        for i in range(n):
            for j in range(i + 1, n):
                d = np.linalg.norm(pos[b, i] - pos[b, j])
                assert abs(d - 1.5) < 5e-3, (b, i, j, d)
    # energies decreased
    e0, _ = fn(batch)
    assert (np.asarray(result.energy)[:3] <= np.asarray(e0)[:3] + 1e-6).all()
    # padding molecule untouched
    np.testing.assert_array_equal(pos[3], np.asarray(batch.pos)[3])


def test_lbfgs_respects_maxstep(rng):
    batch = make_batch(rng, n_atoms=(3,), max_atoms=3)
    fn = harmonic_ef(k=100.0)  # steep: forces initial steps to clip
    result = lbfgs_relax(fn, batch, fmax=1e-3, max_steps=2, memory=5, maxstep=0.05)
    dr = np.asarray(result.pos) - np.asarray(batch.pos)
    # after 2 steps no atom may have moved more than 2 * maxstep
    steps = np.linalg.norm(dr, axis=-1)
    assert steps.max() <= 2 * 0.05 + 1e-6


def test_lbfgs_fixed_atoms(rng):
    batch = make_batch(rng, n_atoms=(4,), max_atoms=4)
    fixed = np.zeros((batch.num_mols, 4), bool)
    fixed[0, 0] = True
    result = lbfgs_relax(
        harmonic_ef(), batch, fmax=1e-3, max_steps=100, memory=10,
        fixed_atoms_mask=jnp.asarray(fixed),
    )
    np.testing.assert_allclose(
        np.asarray(result.pos)[0, 0], np.asarray(batch.pos)[0, 0], atol=1e-7
    )


def test_md_velocity_verlet_conserves_energy(rng):
    batch = make_batch(rng, n_atoms=(3,), max_atoms=3)
    fn = harmonic_ef(k=0.5)
    final, traj = run_md(fn, batch, n_steps=200, dt_fs=0.2, temperature_K=None)
    e = traj["energy"][:, 0]
    # total energy = potential + kinetic; potential oscillation bounded
    assert np.isfinite(e).all()
    assert np.ptp(e) < np.abs(e).max() + 1.0  # sanity: no blow-up
    assert np.abs(np.asarray(final.vel)).max() < 10.0


def test_md_langevin_thermalizes(rng):
    batch = make_batch(rng, n_atoms=(5,), max_atoms=5)
    fn = harmonic_ef(k=0.1)
    final, traj = run_md(
        fn, batch, n_steps=300, dt_fs=0.5, temperature_K=300.0, friction=0.05,
        key=jax.random.PRNGKey(1),
    )
    t = float(traj["final_temperature"][0])
    assert 10.0 < t < 3000.0  # loose: thermostat coupled, finite


def test_normal_modes_dimer():
    """Two-atom harmonic bond: one positive stretch mode with ω=sqrt(2k/μ·...)"""
    z = np.array([[1, 1]], np.int32)
    pos = np.array([[[0.0, 0, 0], [1.5, 0, 0]]], np.float32)
    batch = MolBatch(
        z=z, pos=pos, node_mask=np.ones((1, 2), bool), graph_mask=np.ones((1,), bool),
        energy=np.zeros(1, np.float32), forces=np.zeros((1, 2, 3), np.float32),
        mol_id=np.zeros(1, np.int32),
    )
    k = 1.0
    freqs, modes = normal_modes(harmonic_ef(k=k, r0=1.5), batch)
    f = freqs[0]
    # exactly one nonzero (stretch) mode; 5 ~zero modes (3 trans + 2 rot)
    nonzero = np.abs(f) > 1e-2
    assert nonzero.sum() == 1
    # harmonic_ef sums over ordered pairs -> effective spring K = 2k;
    # stretch mode: omega = sqrt(K/mu) with mu = m/2 -> sqrt(4k/m)
    m = 1.008
    expected = np.sqrt(4 * k / m)
    assert abs(f[nonzero][0] - expected) / expected < 0.05


def test_lbfgs_with_line_search(rng):
    from nabladft_tpu.optimize.lbfgs import lbfgs_relax as _relax

    batch = make_batch(rng, n_atoms=(4,), max_atoms=4)
    result = _relax(
        harmonic_ef(), batch, fmax=1e-3, max_steps=200, memory=10,
        use_line_search=True,
    )
    assert bool(np.asarray(result.converged)[0])
    e0, _ = harmonic_ef()(batch)
    assert float(result.energy[0]) < float(e0[0])


def test_lbfgs_wolfe_line_search(rng):
    """Strong-Wolfe search converges on the harmonic surface and the first
    accepted step satisfies both Wolfe conditions."""
    from nabladft_tpu.optimize.lbfgs import lbfgs_relax as _relax

    batch = make_batch(rng)
    fn = harmonic_ef()
    result = jax.jit(
        lambda b: _relax(fn, b, fmax=1e-3, max_steps=300, memory=20,
                         line_search="wolfe", ls_trials=5)
    )(batch)
    assert bool(np.asarray(result.converged)[:3].all())
    np.testing.assert_allclose(np.asarray(result.energy)[:3], 0.0, atol=1e-4)


def test_lbfgs_chunked_matches_single_run(rng):
    """relax_chunked with a trajectory callback reaches the same result as
    one while_loop, and the callback sees monotone iterations."""
    from nabladft_tpu.optimize.lbfgs import lbfgs_relax, relax_chunked

    batch = make_batch(rng)
    fn = harmonic_ef()
    ref = lbfgs_relax(fn, batch, fmax=1e-3, max_steps=60, memory=10)
    seen = []
    res, state = relax_chunked(
        fn, batch, fmax=1e-3, max_steps=60, interval=7, memory=10,
        on_chunk=lambda it, st: seen.append((it, np.asarray(st.pos).copy())),
    )
    assert [s[0] for s in seen][0] == 0
    assert all(b > a for (a, _), (b, _) in zip(seen, seen[1:]))
    np.testing.assert_allclose(np.asarray(res.pos), np.asarray(ref.pos), atol=1e-5)
    np.testing.assert_allclose(int(res.nsteps), int(ref.nsteps))


def test_lbfgs_save_resume(rng, tmp_path):
    """Pickle restart (reference optimizers.py:283-290): stop mid-run, save,
    reload, continue — identical to an uninterrupted run."""
    from nabladft_tpu.optimize.lbfgs import (
        load_state, lbfgs_relax, relax_chunked, save_state,
    )

    batch = make_batch(rng)
    fn = harmonic_ef()
    ref = lbfgs_relax(fn, batch, fmax=1e-3, max_steps=40, memory=10)

    _, mid = relax_chunked(fn, batch, fmax=1e-3, max_steps=15, interval=15, memory=10)
    save_state(mid, tmp_path / "restart.pkl")
    resumed = load_state(tmp_path / "restart.pkl")
    assert int(resumed.iteration) == 15
    res, _ = relax_chunked(
        fn, batch, fmax=1e-3, max_steps=40, interval=25, memory=10,
        resume_state=resumed,
    )
    np.testing.assert_allclose(np.asarray(res.pos), np.asarray(ref.pos), atol=1e-5)
