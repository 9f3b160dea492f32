"""Hamiltonian predictors: shapes, symmetry, SE(3) covariance.

The key physics check: the predicted matrix must transform as
H(R·pos) = T(R) H(pos) T(R)ᵀ with T the block-diagonal Wigner-D over the
atomic orbital shells — that is what "equivariant Hamiltonian prediction"
means, and it pins the whole irreps pipeline end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.ops import so3

pytestmark = pytest.mark.model

ORBITALS = {1: (0, 0, 1), 6: (0, 0, 0, 1, 1, 2), 8: (0, 0, 0, 1, 1, 2)}
NORB = {z: sum(2 * l + 1 for l in o) for z, o in ORBITALS.items()}

QHNET_KW = dict(
    hidden=16, bottle_hidden=8, num_layers=3, rbf_dim=8, orbitals=ORBITALS,
    start_layer=1,
)


def make_ham_batch(rng, mols=((6, 1, 1, 8), (8, 1, 1)), max_atoms=6, o_max=40):
    B = len(mols) + 1
    z = np.zeros((B, max_atoms), np.int32)
    pos = np.zeros((B, max_atoms, 3), np.float32)
    node_mask = np.zeros((B, max_atoms), bool)
    graph_mask = np.zeros((B,), bool)
    orb_mask = np.zeros((B, o_max), bool)
    ham = np.zeros((B, o_max, o_max), np.float32)
    for i, zs in enumerate(mols):
        n = len(zs)
        z[i, :n] = zs
        pos[i, :n] = rng.uniform(-2, 2, (n, 3))
        node_mask[i, :n] = True
        graph_mask[i] = True
        no = sum(NORB[int(q)] for q in zs)
        orb_mask[i, :no] = True
        m = rng.normal(size=(no, no)).astype(np.float32)
        ham[i, :no, :no] = m + m.T
    return MolBatch(
        z=z, pos=pos, node_mask=node_mask, graph_mask=graph_mask,
        energy=np.zeros(B, np.float32),
        forces=np.zeros((B, max_atoms, 3), np.float32),
        mol_id=np.arange(B, dtype=np.int32),
        hamiltonian=ham, orb_mask=orb_mask,
    )


def orbital_rotation(zs, rot, o_max):
    """Block-diagonal Wigner-D over the shells of a molecule."""
    ds = [np.asarray(d)[0] for d in so3.wigner_d(jnp.asarray(rot[None]), 2)]
    t = np.zeros((o_max, o_max))
    off = 0
    for z in zs:
        for l in ORBITALS[int(z)]:
            k = 2 * l + 1
            t[off : off + k, off : off + k] = ds[l]
            off += k
    for i in range(off, o_max):
        t[i, i] = 1.0
    return t


@pytest.fixture(scope="module")
def qhnet_setup():
    rng = np.random.default_rng(0)
    batch = make_ham_batch(rng)
    model = create_model("qhnet", **QHNET_KW)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    return model, variables, batch, out


def test_qhnet_shapes_and_symmetry(qhnet_setup):
    _, _, batch, out = qhnet_setup
    h = np.asarray(out["hamiltonian"])
    assert h.shape == batch.hamiltonian.shape
    assert np.isfinite(h).all()
    np.testing.assert_allclose(h, np.swapaxes(h, -1, -2), atol=1e-5)
    # entries outside the orbital mask are zero
    om = np.asarray(batch.orb_mask)
    pair = om[:, :, None] & om[:, None, :]
    assert np.abs(h[~pair]).max() == 0.0


def test_qhnet_rotation_covariance(qhnet_setup):
    model, variables, batch, out = qhnet_setup
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = q.astype(np.float64)
    out_rot = model.apply(variables, batch.replace(pos=np.asarray(batch.pos) @ rot.T.astype(np.float32)))
    h, h_rot = np.asarray(out["hamiltonian"]), np.asarray(out_rot["hamiltonian"])
    o_max = h.shape[-1]
    for b in range(2):
        zs = np.asarray(batch.z[b])[np.asarray(batch.node_mask[b])]
        t = orbital_rotation(zs, rot, o_max)
        expected = t @ h[b] @ t.T
        np.testing.assert_allclose(h_rot[b], expected, atol=5e-3, rtol=1e-2)


def test_qhnet_translation_invariance(qhnet_setup):
    model, variables, batch, out = qhnet_setup
    out_t = model.apply(
        variables, batch.replace(pos=np.asarray(batch.pos) + np.float32([1.0, -2.0, 0.5]))
    )
    np.testing.assert_allclose(
        np.asarray(out["hamiltonian"]), np.asarray(out_t["hamiltonian"]),
        atol=1e-4, rtol=1e-3,
    )


PHISNET_KW = dict(
    order=2, num_features=16, num_basis_functions=8, num_modules=2,
    orbitals=ORBITALS, cutoff=8.0,
)


@pytest.fixture(scope="module")
def phisnet_setup():
    rng = np.random.default_rng(0)
    batch = make_ham_batch(rng)
    batch = batch.replace(overlap=batch.hamiltonian, core=batch.hamiltonian)
    model = create_model("phisnet", **PHISNET_KW)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    return model, variables, batch, out


def test_phisnet_shapes_symmetry(phisnet_setup):
    _, _, batch, out = phisnet_setup
    for key in ("hamiltonian", "overlap", "core"):
        m = np.asarray(out[key])
        assert m.shape == batch.hamiltonian.shape
        assert np.isfinite(m).all()
        np.testing.assert_allclose(m, np.swapaxes(m, -1, -2), atol=1e-5)
    om = np.asarray(batch.orb_mask)
    pair = om[:, :, None] & om[:, None, :]
    assert np.abs(np.asarray(out["hamiltonian"])[~pair]).max() == 0.0


def test_phisnet_rotation_covariance(phisnet_setup):
    model, variables, batch, out = phisnet_setup
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = q
    out_rot = model.apply(
        variables, batch.replace(pos=np.asarray(batch.pos) @ rot.T.astype(np.float32))
    )
    o_max = batch.hamiltonian.shape[-1]
    for key in ("hamiltonian", "overlap"):
        h, h_rot = np.asarray(out[key]), np.asarray(out_rot[key])
        for b in range(2):
            zs = np.asarray(batch.z[b])[np.asarray(batch.node_mask[b])]
            t = orbital_rotation(zs, rot, o_max)
            np.testing.assert_allclose(
                h_rot[b], t @ h[b] @ t.T, atol=5e-3, rtol=1e-2, err_msg=key
            )


def test_qhnet_grad_compiles(qhnet_setup):
    model, variables, batch, _ = qhnet_setup
    from nabladft_tpu.train.losses import matrix_rmse_mae

    @jax.jit
    def loss(params):
        out = model.apply(params, batch)
        pm = batch.orb_mask[:, :, None] & batch.orb_mask[:, None, :]
        return matrix_rmse_mae(out["hamiltonian"], batch.hamiltonian, pm)

    g = jax.grad(loss)(variables)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_phisnet_energy_forces_heads(rng):
    """PhiSNet with predict_energy: E invariant under rotation/translation,
    forces equivariant (reference nn/neural_network.py:969-991 semantics)."""
    from nabladft_tpu.models.base import forward

    batch = make_ham_batch(np.random.default_rng(3))
    model = create_model("phisnet", predict_energy=True, **PHISNET_KW)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    out = forward(model, variables, batch)
    assert set(out) >= {"hamiltonian", "overlap", "core", "energy", "forces"}
    assert out["energy"].shape == batch.energy.shape
    assert out["forces"].shape == batch.forces.shape

    q, _ = np.linalg.qr(np.random.default_rng(5).normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = q.astype(np.float32)
    out_rot = forward(model, variables, batch.replace(pos=np.asarray(batch.pos) @ rot.T))
    np.testing.assert_allclose(
        np.asarray(out["energy"]), np.asarray(out_rot["energy"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["forces"]) @ rot.T, np.asarray(out_rot["forces"]),
        rtol=1e-3, atol=1e-4,
    )
    out_t = forward(model, variables, batch.replace(pos=np.asarray(batch.pos) + 1.3))
    np.testing.assert_allclose(
        np.asarray(out["energy"]), np.asarray(out_t["energy"]), rtol=1e-4, atol=1e-5
    )


def test_qhnet_block_loss_equals_matrix_loss(rng):
    """Block-space (assemble_matrix=False) loss and MAE equal the masked
    full-matrix ones (SURVEY §7 per-block-loss equivalence)."""
    from nabladft_tpu.train.losses import multitask_loss
    from nabladft_tpu.train.metrics import batch_metric_sums

    batch = make_ham_batch(np.random.default_rng(4))
    kw = dict(hidden=8, bottle_hidden=4, num_layers=2, rbf_dim=8,
              start_layer=0, orbitals=ORBITALS, remat=False)
    m_full = create_model("qhnet", assemble_matrix=True, **kw)
    m_blk = create_model("qhnet", assemble_matrix=False, **kw)
    variables = jax.jit(m_full.init)(jax.random.PRNGKey(0), batch)
    specs = {"hamiltonian": "rmse_mae"}
    coefs = {"hamiltonian": 1.0}

    out_f = m_full.apply(variables, batch)
    out_b = m_blk.apply(variables, batch)
    l_f = multitask_loss(out_f, batch, specs, coefs)["total"]
    l_b = multitask_loss(out_b, batch, specs, coefs)["total"]
    np.testing.assert_allclose(float(l_b), float(l_f), rtol=1e-5)

    s_f = batch_metric_sums(out_f, batch)
    s_b = batch_metric_sums(out_b, batch)
    np.testing.assert_allclose(
        float(s_b["hamiltonian/abs_sum"]), float(s_f["hamiltonian/abs_sum"]), rtol=1e-5
    )
    assert float(s_b["hamiltonian/count"]) == float(s_f["hamiltonian/count"])
