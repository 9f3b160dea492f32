"""Molecular dynamics and normal-mode analysis, on device.

Replaces the reference's PYGAseInterface (optimization/pyg_ase_interface.py:
34-334: ASE Langevin/VelocityVerlet MD, Maxwell-Boltzmann velocity init,
normal modes via ase.Vibrations finite differences) with compiled
`lax.scan` integrators over padded batches — whole trajectories run without
host round trips.

Units: positions Å, energy Hartree (nablaDFT task units), masses in amu.
Internally we use ASE-style units where time is fs via the conversion
factor sqrt(amu·Å²/Hartree): dt is supplied in fs and converted.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nabladft_tpu.data.ase_codec import ATOMIC_MASSES
from nabladft_tpu.data.batch import MolBatch

# 1 fs in sqrt(amu Å² / Hartree) "natural" time units:
#   t_nat = sqrt(amu Å²/Eh) = 1.0327499e-15 s  ->  1 fs = 0.968287 t_nat
FS = 0.9682885864793366
# Boltzmann constant in Hartree / K
KB_HARTREE = 3.166811563e-6


class MDState(NamedTuple):
    pos: jnp.ndarray  # [B,A,3] Å
    vel: jnp.ndarray  # [B,A,3] Å / t_nat
    energy: jnp.ndarray  # [B] potential energy
    forces: jnp.ndarray  # [B,A,3]
    key: jax.Array


def atomic_masses(z: jnp.ndarray) -> jnp.ndarray:
    table = jnp.asarray(ATOMIC_MASSES, jnp.float32)
    return table[jnp.clip(z, 0, len(ATOMIC_MASSES) - 1)]


def maxwell_boltzmann_velocities(
    key: jax.Array, batch: MolBatch, temperature_K: float
) -> jnp.ndarray:
    """Gaussian velocities at T with zero center-of-mass drift
    (reference pyg_ase_interface.py:265 MaxwellBoltzmannDistribution)."""
    masses = atomic_masses(batch.z)  # [B,A]
    std = jnp.sqrt(KB_HARTREE * temperature_K / jnp.maximum(masses, 1e-6))
    vel = std[..., None] * jax.random.normal(key, (*batch.z.shape, 3))
    vel = vel * batch.node_mask[..., None]
    # remove center-of-mass momentum
    mom = jnp.sum(vel * masses[..., None], axis=1, keepdims=True)
    mtot = jnp.sum(masses * batch.node_mask, axis=1)[:, None, None]
    vel = vel - (mom / jnp.maximum(mtot, 1e-6)) * batch.node_mask[..., None]
    return vel


def kinetic_temperature(vel: jnp.ndarray, batch: MolBatch) -> jnp.ndarray:
    masses = atomic_masses(batch.z)
    ke = 0.5 * jnp.sum(masses[..., None] * vel * vel * batch.node_mask[..., None], axis=(1, 2))
    dof = 3.0 * jnp.maximum(batch.node_mask.sum(axis=1) - 1, 1)
    return 2.0 * ke / (dof * KB_HARTREE)


def run_md(
    energy_forces_fn: Callable,
    batch: MolBatch,
    n_steps: int,
    dt_fs: float = 0.5,
    temperature_K: Optional[float] = None,
    friction: float = 0.002,
    key: Optional[jax.Array] = None,
    initial_velocities: Optional[jnp.ndarray] = None,
    record_every: int = 1,
) -> Tuple[MDState, dict]:
    """Velocity-Verlet (temperature_K=None) or Langevin dynamics.

    Langevin follows ASE's integrator: friction γ in 1/t_nat, stochastic
    kicks at temperature T. Returns the final state and a trajectory dict
    of recorded pos/energy/temperature (host arrays, [n_rec, ...]).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    dt = dt_fs * FS
    masses = atomic_masses(batch.z)[..., None]  # [B,A,1]
    nmask = batch.node_mask[..., None]

    if initial_velocities is None:
        if temperature_K is not None:
            key, sub = jax.random.split(key)
            vel = maxwell_boltzmann_velocities(sub, batch, temperature_K)
        else:
            vel = jnp.zeros_like(batch.pos)
    else:
        vel = initial_velocities

    e0, f0 = energy_forces_fn(batch)
    st = MDState(pos=batch.pos, vel=vel, energy=e0, forces=f0, key=key)

    def vv_step(st: MDState, _):
        acc = st.forces / jnp.maximum(masses, 1e-6)
        vel_half = st.vel + 0.5 * dt * acc
        pos = st.pos + dt * vel_half * nmask
        e, f = energy_forces_fn(batch.replace(pos=pos))
        vel = vel_half + 0.5 * dt * f / jnp.maximum(masses, 1e-6)
        new = MDState(pos=pos, vel=vel * nmask, energy=e, forces=f, key=st.key)
        return new, (pos, e)

    def langevin_step(st: MDState, _):
        key, sub = jax.random.split(st.key)
        acc = st.forces / jnp.maximum(masses, 1e-6)
        sigma = jnp.sqrt(2.0 * friction * KB_HARTREE * temperature_K / jnp.maximum(masses, 1e-6))
        noise = jax.random.normal(sub, st.vel.shape) * sigma * jnp.sqrt(dt)
        vel_half = st.vel + 0.5 * dt * (acc - friction * st.vel) + 0.5 * noise
        pos = st.pos + dt * vel_half * nmask
        e, f = energy_forces_fn(batch.replace(pos=pos))
        acc2 = f / jnp.maximum(masses, 1e-6)
        vel = vel_half + 0.5 * dt * (acc2 - friction * vel_half) + 0.5 * noise
        new = MDState(pos=pos, vel=vel * nmask, energy=e, forces=f, key=key)
        return new, (pos, e)

    step = vv_step if temperature_K is None or friction == 0.0 else langevin_step
    final, (traj_pos, traj_e) = jax.lax.scan(step, st, None, length=n_steps)
    rec = slice(None, None, record_every)
    traj = {
        "positions": np.asarray(traj_pos[rec]),
        "energy": np.asarray(traj_e[rec]),
        "final_temperature": np.asarray(kinetic_temperature(final.vel, batch)),
    }
    return final, traj


def normal_modes(
    energy_forces_fn: Callable,
    batch: MolBatch,
    displacement: float = 0.01,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vibrational analysis by central finite differences of forces
    (reference compute_normal_modes → ase.Vibrations,
    pyg_ase_interface.py:317-334).

    Returns (frequencies [B, 3A] in sqrt(Eh/amu)/Å, modes [B, 3A, A, 3]).
    Rows for padded atoms carry zero frequency.
    """
    b, a = batch.z.shape
    masses = np.asarray(atomic_masses(batch.z))

    def force_at(pos):
        _, f = energy_forces_fn(batch.replace(pos=pos))
        return f

    # displace every (atom, axis) in turn: build Hessian column by column
    def column(carry, idx):
        i, c = idx // 3, idx % 3
        e = jnp.zeros((b, a, 3)).at[:, i, c].set(displacement)
        f_plus = force_at(batch.pos + e * batch.node_mask[..., None])
        f_minus = force_at(batch.pos - e * batch.node_mask[..., None])
        col = -(f_plus - f_minus) / (2 * displacement)  # [B,A,3] = dF/dx
        return carry, col

    _, cols = jax.lax.scan(column, None, jnp.arange(3 * a))
    hess = np.asarray(cols).reshape(3 * a, b, 3 * a).transpose(1, 0, 2)  # [B,3A,3A]
    # mass-weighted
    m = np.repeat(masses, 3, axis=1)  # [B, 3A]
    m = np.maximum(m, 1e-6)
    w = 1.0 / np.sqrt(m)
    hess_mw = hess * w[:, :, None] * w[:, None, :]
    hess_mw = 0.5 * (hess_mw + np.swapaxes(hess_mw, 1, 2))
    evals, evecs = np.linalg.eigh(hess_mw)
    freqs = np.sign(evals) * np.sqrt(np.abs(evals))
    modes = (evecs * w[:, :, None]).transpose(0, 2, 1).reshape(b, 3 * a, a, 3)
    return freqs, modes
