"""Graph construction: neighbor lists, masks, triplets — vs numpy brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.ops import graph

pytestmark = pytest.mark.model


def brute_force_neighbors(pos, mask, cutoff):
    """Reference neighbor sets per atom via numpy."""
    n = len(pos)
    out = []
    for i in range(n):
        nbrs = []
        if mask[i]:
            for j in range(n):
                if j != i and mask[j]:
                    d = np.linalg.norm(pos[j] - pos[i])
                    if d < cutoff:
                        nbrs.append((d, j))
        out.append(sorted(nbrs))
    return out


def test_neighbor_list_matches_brute_force(small_batch):
    cutoff, K = 5.0, 8
    nl = graph.neighbor_list(jnp.asarray(small_batch.pos), jnp.asarray(small_batch.node_mask), cutoff, K)
    idx, mask, dist = np.asarray(nl.idx), np.asarray(nl.mask), np.asarray(nl.dist)
    pos = np.asarray(small_batch.pos)
    for b in range(small_batch.num_mols):
        ref = brute_force_neighbors(pos[b], np.asarray(small_batch.node_mask[b]), cutoff)
        for i in range(small_batch.max_atoms):
            expected = [j for _, j in ref[i][:K]]
            got = [int(idx[b, i, k]) for k in range(K) if mask[b, i, k]]
            assert sorted(got) == sorted(expected), (b, i)
            for k in range(K):
                if mask[b, i, k]:
                    d = np.linalg.norm(pos[b, idx[b, i, k]] - pos[b, i])
                    assert abs(dist[b, i, k] - d) < 1e-4


def test_strict_topk_keeps_closest(rng):
    """With K smaller than the in-cutoff degree, the K closest are kept
    (reference enforce_max_neighbors_strictly, painn_pyg/utils.py:223)."""
    n = 12
    pos = rng.uniform(-2, 2, size=(1, n, 3)).astype(np.float32)
    mask = np.ones((1, n), bool)
    K = 4
    nl = graph.neighbor_list(jnp.asarray(pos), jnp.asarray(mask), cutoff=100.0, max_neighbors=K)
    dist = np.asarray(nl.dist)
    for i in range(n):
        d_all = sorted(
            np.linalg.norm(pos[0, j] - pos[0, i]) for j in range(n) if j != i
        )
        np.testing.assert_allclose(sorted(dist[0, i]), d_all[:K], rtol=1e-5)


def test_gather_scatter_roundtrip(small_batch):
    pos = jnp.asarray(small_batch.pos)
    mask = jnp.asarray(small_batch.node_mask)
    nl = graph.neighbor_list(pos, mask, 5.0, 6)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(pos.shape[0], pos.shape[1], 8)).astype(np.float32)
    )
    gathered = graph.gather_nodes(x, nl.idx)
    assert gathered.shape == (*nl.idx.shape, 8)
    # scatter ones to senders == in-degree as sender
    ones = jnp.ones((*nl.idx.shape, 1))
    deg = graph.scatter_to_nodes(ones, nl.idx, nl.mask, pos.shape[1])
    # each directed edge (j->i) contributes 1 to j; total = number of edges
    assert int(deg.sum()) == int(nl.mask.sum())


def test_triplet_angles_simple():
    """3 atoms on known geometry: check angle values and back-edge mask."""
    # i at origin, j at (1,0,0), k at (1,1,0): angle at j between j->i and j->k = 90 deg
    pos = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [1, 1, 0]]], jnp.float32)
    mask = jnp.ones((1, 3), bool)
    nl = graph.neighbor_list(pos, mask, 10.0, 2)
    cos, tmask = graph.triplet_angles(nl)
    cos, tmask = np.asarray(cos), np.asarray(tmask)
    idx = np.asarray(nl.idx)
    k_idx = np.asarray(graph.gather_nodes(nl.idx, nl.idx))
    found = False
    for n in range(2):
        if idx[0, 0, n] != 1:
            continue
        for m in range(2):
            if tmask[0, 0, n, m]:
                assert k_idx[0, 0, n, m] == 2  # k == i(=0) must be masked out
                assert abs(cos[0, 0, n, m]) < 1e-5  # 90 degrees
                found = True
    assert found


def test_padding_has_no_neighbors(small_batch):
    nl = graph.neighbor_list(
        jnp.asarray(small_batch.pos), jnp.asarray(small_batch.node_mask), 5.0, 8
    )
    pad_rows = ~np.asarray(small_batch.node_mask)
    assert not np.asarray(nl.mask)[pad_rows].any()
    # padded molecule (index 3) has no neighbors at all
    assert not np.asarray(nl.mask)[3].any()
