"""PBC radius graph + symmetrization (reference painn_pyg/utils.py:318
radius_graph_pbc, painn_pyg/painn.py:168-304 symmetrize_edges).

Brute-force numpy image enumeration is the ground truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.ops import graph


def brute_force_edges(pos, cell, cutoff, n_images, pbc=(True, True, True)):
    """All (i, j, offset) with 0 < |pos_j + offset@cell - pos_i| < cutoff."""
    a = len(pos)
    edges = set()
    dists = {}
    rng = [range(-n_images, n_images + 1) if p else [0] for p in pbc]
    for i in range(a):
        for j in range(a):
            for ox in rng[0]:
                for oy in rng[1]:
                    for oz in rng[2]:
                        off = np.array([ox, oy, oz], float)
                        if i == j and not off.any():
                            continue
                        d = np.linalg.norm(pos[j] + off @ cell - pos[i])
                        if d < cutoff:
                            edges.add((i, j, ox, oy, oz))
                            dists[(i, j, ox, oy, oz)] = d
    return edges, dists


def nl_edges(nl, b=0):
    out = set()
    dd = {}
    idx = np.asarray(nl.idx[b])
    off = np.asarray(nl.offset[b])
    mask = np.asarray(nl.mask[b])
    dist = np.asarray(nl.dist[b])
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                key = (i, int(idx[i, k]), *(int(x) for x in off[i, k]))
                out.add(key)
                dd[key] = float(dist[i, k])
    return out, dd


def test_pbc_matches_brute_force():
    rng = np.random.default_rng(0)
    cell = np.diag([4.0, 5.0, 6.0]) + rng.normal(0, 0.2, (3, 3))
    pos = rng.uniform(0, 4.0, (6, 3))
    cutoff = 3.5
    ref_edges, ref_d = brute_force_edges(pos, cell, cutoff, 1)
    nl = graph.pbc_neighbor_list(
        jnp.asarray(pos, jnp.float32)[None],
        jnp.ones((1, 6), bool),
        jnp.asarray(cell, jnp.float32)[None],
        cutoff,
        max_neighbors=len(ref_edges) + 8,
        n_images=1,
        symmetrize=False,
    )
    got_edges, got_d = nl_edges(nl)
    assert got_edges == ref_edges
    for e in ref_edges:
        assert got_d[e] == pytest.approx(ref_d[e], abs=1e-4)


def test_pbc_flags_restrict_axes():
    cell = np.diag([3.0, 3.0, 3.0])
    pos = np.array([[0.1, 0.1, 0.1], [2.9, 2.9, 2.9]])
    cutoff = 1.5
    for pbc in [(True, False, False), (False, True, True), (False, False, False)]:
        ref_edges, _ = brute_force_edges(pos, cell, cutoff, 1, pbc)
        nl = graph.pbc_neighbor_list(
            jnp.asarray(pos, jnp.float32)[None],
            jnp.ones((1, 2), bool),
            jnp.asarray(cell, jnp.float32)[None],
            cutoff,
            max_neighbors=30,
            n_images=1,
            pbc=pbc,
            symmetrize=False,
        )
        got_edges, _ = nl_edges(nl)
        assert got_edges == ref_edges, pbc


def test_topk_truncation_keeps_nearest():
    # receiver 0 has 3 in-cutoff candidates at distinct distances; K=2 must
    # keep the 2 nearest (strict top-k semantics, painn_pyg/utils.py:223)
    cell = np.diag([50.0, 50.0, 50.0])
    pos = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.5, 0], [0, 0, 2.0]])
    nl = graph.pbc_neighbor_list(
        jnp.asarray(pos, jnp.float32)[None],
        jnp.ones((1, 4), bool),
        jnp.asarray(cell, jnp.float32)[None],
        cutoff=3.0,
        max_neighbors=2,
        symmetrize=False,
    )
    got, dd = nl_edges(nl)
    mine = {e for e in got if e[0] == 0}
    assert {(0, 1, 0, 0, 0), (0, 2, 0, 0, 0)} == mine


def test_symmetrization_adds_counter_edges():
    # asymmetric truncation: atom 0 is crowded (K cap drops its edge to 3),
    # but atom 3 keeps 0 — symmetrize must restore 0's counter-edge
    cell = np.diag([60.0, 60.0, 60.0])
    # with K=3, receiver 0 keeps its 3 nearest senders {1,2,3} and drops 4;
    # receiver 4 (whose only neighbor is 0) keeps (4, 0) — asymmetric.
    pos = np.array(
        [[0.0, 0, 0], [0.6, 0, 0], [0, 0.7, 0], [0, 0, 0.8], [0, 0, -2.4]]
    )
    kw = dict(cutoff=3.0, max_neighbors=3, n_images=1)
    args = (
        jnp.asarray(pos, jnp.float32)[None],
        jnp.ones((1, 5), bool),
        jnp.asarray(cell, jnp.float32)[None],
    )
    plain, _ = nl_edges(graph.pbc_neighbor_list(*args, **kw, symmetrize=False))
    assert (4, 0, 0, 0, 0) in plain and (0, 4, 0, 0, 0) not in plain
    sym, _ = nl_edges(graph.pbc_neighbor_list(*args, **kw, symmetrize=True))
    # every kept edge has its mirror
    for (i, j, ox, oy, oz) in sym:
        assert (j, i, -ox, -oy, -oz) in sym
    assert (0, 4, 0, 0, 0) in sym


def test_self_image_neighbors():
    # one atom in a small cell neighbors its own periodic copies
    cell = np.diag([2.0, 10.0, 10.0])
    pos = np.array([[0.5, 5.0, 5.0]])
    nl = graph.pbc_neighbor_list(
        jnp.asarray(pos, jnp.float32)[None],
        jnp.ones((1, 1), bool),
        jnp.asarray(cell, jnp.float32)[None],
        cutoff=2.5,
        max_neighbors=8,
        symmetrize=False,
    )
    got, dd = nl_edges(nl)
    assert (0, 0, 1, 0, 0) in got and (0, 0, -1, 0, 0) in got
    assert dd[(0, 0, 1, 0, 0)] == pytest.approx(2.0, abs=1e-5)


def _painn_batch(pos, cell, b_atoms=None):
    a = len(pos)
    return MolBatch(
        z=jnp.asarray([[6] * a]),
        pos=jnp.asarray(pos, jnp.float32)[None],
        node_mask=jnp.ones((1, a), bool),
        graph_mask=jnp.ones(1, bool),
        energy=jnp.zeros(1),
        forces=jnp.zeros((1, a, 3)),
        mol_id=jnp.zeros(1, jnp.int32),
        cell=jnp.asarray(cell, jnp.float32)[None],
    )


def test_painn_pbc_matches_dense_in_huge_cell():
    """With a cell so large no images are in range, the PBC path must equal
    the dense molecular path (same params — layout-independent tree)."""
    from nabladft_tpu.models import create_model

    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 4.0, (5, 3))
    kw = dict(hidden=32, n_interactions=2, n_rbf=16, cutoff=5.0)
    m_mol = create_model("painn", **kw)
    m_pbc = create_model("painn", pbc=True, **kw)
    batch = _painn_batch(pos, np.diag([80.0, 80.0, 80.0]))
    params = m_mol.init(__import__("jax").random.PRNGKey(0), batch)
    e_mol = m_mol.apply(params, batch)["energy"]
    e_pbc = m_pbc.apply(params, batch)["energy"]
    np.testing.assert_allclose(np.asarray(e_mol), np.asarray(e_pbc), rtol=1e-5)


def test_painn_pbc_lattice_translation_invariance():
    """Translating one atom by a lattice vector must not change the energy."""
    import jax

    from nabladft_tpu.models import create_model

    rng = np.random.default_rng(2)
    cell = np.diag([3.5, 3.8, 4.1])
    pos = rng.uniform(0, 3.5, (4, 3))
    m = create_model("painn", pbc=True, hidden=32, n_interactions=2, n_rbf=16,
                     cutoff=3.0)
    b1 = _painn_batch(pos, cell)
    params = m.init(jax.random.PRNGKey(0), b1)
    pos2 = pos.copy()
    pos2[2] += cell[0] + cell[2]  # move atom 2 by a lattice vector
    b2 = _painn_batch(pos2, cell)
    e1 = m.apply(params, b1)["energy"]
    e2 = m.apply(params, b2)["energy"]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=2e-5)
