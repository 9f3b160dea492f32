"""On-device molecular graph construction over padded batches.

Replaces the reference's per-model CUDA `radius_graph` calls
(torch_cluster; painn_pyg/utils.py:318 `radius_graph_pbc`, qhnet.py:258,
escn.py) and its strict max-neighbor capping
(painn_pyg/utils.py:223-317 `enforce_max_neighbors_strictly` top-k
semantics) with fixed-shape, mask-based constructions that XLA can fuse:

  * molecules here are ≤ 62 atoms (nablaDFT README.md:63-64), so the
    all-pairs O(A²) distance matrix is tiny — computing it densely each step
    on device is far cheaper than a host neighbor search + transfer;
  * neighbor lists have a **static budget K**: the K nearest in-cutoff
    neighbors per atom, exactly the reference's strict top-k semantics;
  * everything returns masks instead of ragged sizes.

Two graph views, both derived from the same distance matrix:
  dense view   — adjacency [B,A,A] for models that operate all-pairs
                 (Graphormer3D dense attention, QHNet pair blocks);
  neighbor view— `NeighborList` with idx/mask [B,A,K] for message-passing
                 models; triplet (and quadruplet) structure is built by
                 composing gathers over it, never by host-side index
                 construction (contrast gemnet_oc/interaction_indices.py).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10
_BIG = 1e10


class DenseGraph(NamedTuple):
    """All-pairs view. diff[b,i,j] = pos[j] - pos[i]."""

    diff: jnp.ndarray  # [B, A, A, 3]
    dist: jnp.ndarray  # [B, A, A]   (= _BIG on masked pairs)
    adj: jnp.ndarray  # [B, A, A] bool: within cutoff, i != j, both real


class NeighborList(NamedTuple):
    """Fixed-K nearest-neighbor view. Neighbor n of atom i is j = idx[b,i,n]."""

    idx: jnp.ndarray  # [B, A, K] int32 (clipped to valid range where masked)
    mask: jnp.ndarray  # [B, A, K] bool
    diff: jnp.ndarray  # [B, A, K, 3]  pos[j] - pos[i]
    dist: jnp.ndarray  # [B, A, K]
    unit: jnp.ndarray  # [B, A, K, 3]  normalized diff (0 where masked)


def pairwise(pos: jnp.ndarray, node_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pairwise displacement/distance with padding masked out.

    Returns (diff [B,A,A,3], dist [B,A,A], pair_mask [B,A,A]) where
    pair_mask excludes self-pairs and any pair touching a padded atom.
    Masked entries of dist are _BIG (not 0) so top-k ordering is trivial.
    """
    diff = pos[:, None, :, :] - pos[:, :, None, :]
    a = pos.shape[1]
    eye = jnp.eye(a, dtype=bool)
    pair_mask = node_mask[:, :, None] & node_mask[:, None, :] & ~eye
    d2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, _EPS))
    dist = jnp.where(pair_mask, dist, _BIG)
    return diff, dist, pair_mask


def dense_graph(pos: jnp.ndarray, node_mask: jnp.ndarray, cutoff: float) -> DenseGraph:
    diff, dist, pair_mask = pairwise(pos, node_mask)
    adj = pair_mask & (dist < cutoff)
    return DenseGraph(diff=diff, dist=dist, adj=adj)


def dense_topk_mask(dist: jnp.ndarray, adj: jnp.ndarray, k: int) -> jnp.ndarray:
    """Restrict a dense adjacency to each row's k nearest neighbors (the
    dense-formulation analog of the strict top-k neighbor cap,
    painn_pyg/utils.py:223-317).

    Tie caveat: every edge within 1e-7 of the k-th distance is kept, so
    exactly degenerate geometries (e.g. symmetric molecules where several
    neighbors sit at the identical k-th distance) can keep MORE than k
    edges per row, whereas `neighbor_list`'s `lax.top_k` keeps exactly k
    (breaking ties by index). The two layouts therefore agree only on
    tie-free geometries; checkpoints trained with one layout should be
    evaluated with the same layout if the data contains exact ties.
    """
    a = dist.shape[-1]
    if k >= a:
        return adj
    neg = jnp.where(adj, -dist, -jnp.inf)
    kth = jax.lax.top_k(neg, k)[0][..., -1:]  # [B,A,1] k-th smallest distance
    return adj & (dist <= -kth + 1e-7)


def neighbor_list(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    cutoff: float,
    max_neighbors: int,
    dense: Optional[DenseGraph] = None,
) -> NeighborList:
    """K-nearest in-cutoff neighbors per atom (strict top-k by distance).

    Reference parity: painn_pyg/utils.py:223-317 keeps, per atom, the
    `max_neighbors` *closest* neighbors when the cutoff yields more — here
    that is a single `lax.top_k` over the masked distance row.

    `dense`: pass a precomputed `dense_graph(pos, node_mask, cutoff)` when
    the caller also needs the all-pairs view (e.g. DimeNet++'s compact
    layout), so the O(A²) distance work is done once explicitly instead of
    relying on XLA CSE to dedupe it.
    """
    g = dense if dense is not None else dense_graph(pos, node_mask, cutoff)
    k = min(max_neighbors, pos.shape[1])
    # top_k of negative distance = k smallest; masked pairs hold _BIG.
    neg = jnp.where(g.adj, -g.dist, -_BIG)
    vals, idx = jax.lax.top_k(neg, k)  # [B, A, K]
    mask = vals > -_BIG * 0.5
    idx = idx.astype(jnp.int32)
    diff = jnp.take_along_axis(g.diff, idx[..., None], axis=2)  # [B,A,K,3]
    dist = jnp.where(mask, -vals, 0.0)
    unit = diff / jnp.maximum(dist, _EPS)[..., None]
    unit = jnp.where(mask[..., None], unit, 0.0)
    diff = jnp.where(mask[..., None], diff, 0.0)
    return NeighborList(idx=idx, mask=mask, diff=diff, dist=dist, unit=unit)


def pad_neighbor_list(nl: NeighborList, multiple: int = 8) -> NeighborList:
    """Pad the K axis up to a multiple of `multiple` with masked slots.

    TPU Mosaic tiles sublanes in groups of 8; kernels that stack
    per-receiver K-row blocks (ops/pallas/eqv2_attn) need K % 8 == 0 or
    per-block row slices land at unsupported tile offsets. Padded slots
    are indistinguishable from ordinary under-filled neighbor slots
    (mask False, idx 0, dist/diff/unit 0), so downstream semantics are
    unchanged.
    """
    k = nl.idx.shape[2]
    pad = (-k) % multiple
    if pad == 0:
        return nl
    w3 = [(0, 0), (0, 0), (0, pad)]
    w4 = w3 + [(0, 0)]
    return NeighborList(
        idx=jnp.pad(nl.idx, w3),
        mask=jnp.pad(nl.mask, w3),
        diff=jnp.pad(nl.diff, w4),
        dist=jnp.pad(nl.dist, w3),
        unit=jnp.pad(nl.unit, w4),
    )


def gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-node features at (arbitrarily nested) node indices.

    x: [B, A, ...feat], idx: [B, ...index]  ->  [B, ...index, ...feat]
    """
    b, a = x.shape[0], x.shape[1]
    feat_shape = x.shape[2:]
    idx_shape = idx.shape[1:]
    flat_idx = idx.reshape(b, -1)  # [B, prod(index)]
    out = jnp.take_along_axis(
        x.reshape(b, a, -1), flat_idx[..., None], axis=1
    )  # [B, prod(index), F]
    return out.reshape(b, *idx_shape, *feat_shape)


def scatter_to_nodes(
    edge_vals: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray, num_nodes: int
) -> jnp.ndarray:
    """Sum per-edge values onto the *sender* node j = idx[b,i,n].

    edge_vals: [B, A, K, F] -> [B, num_nodes, F].
    (Aggregation onto the receiver i is just a masked sum over axis 2 and
    needs no scatter.) Implemented as one one-hot matmul per batch — an
    [A*K, A] × [A*K, F] contraction that XLA places on the MXU, which beats
    serialized scatter-adds for these sizes.
    """
    b, a, k = idx.shape
    f = edge_vals.shape[-1]
    flat_idx = idx.reshape(b, a * k)
    flat_val = jnp.where(mask[..., None], edge_vals, 0.0).reshape(b, a * k, f)
    onehot = jax.nn.one_hot(flat_idx, num_nodes, dtype=edge_vals.dtype)  # [B,AK,N]
    return jnp.einsum("ben,bef->bnf", onehot, flat_val)


def gather_neighbor_edges(edge_feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """For each edge (j→i) fetch the feature rows of all edges into j.

    edge_feat: [B, A, K, F] (feature of edge (idx[b,i,n] → i) stored at
    [b,i,n]);  returns [B, A, K, K, F] where out[b,i,n,m] = the feature of
    edge (idx[b,j,m] → j) with j = idx[b,i,n]. This is the triplet gather
    used by DimeNet++/GemNet-OC in place of host-built triplet id arrays
    (reference gemnet_oc/interaction_indices.py:13-164).
    """
    b, a, k = idx.shape
    feat = edge_feat.reshape(b, a, -1)  # [B, A, K*F]
    gathered = jnp.take_along_axis(feat, idx.reshape(b, -1)[..., None], axis=1)
    return gathered.reshape(b, a, k, k, *edge_feat.shape[3:])


def triplet_angles(nl: NeighborList) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Angles for triplets k→j→i over the fixed-K neighbor list.

    For edge e1 = (j→i) at [b,i,n] and each edge e2 = (k→j) at [b,j,m]:
      angle(b,i,n,m) = angle between vectors (pos_j→pos_i) and (pos_j→pos_k).
    Returns (cos_angle [B,A,K,K], trip_mask [B,A,K,K]); trip_mask excludes
    masked edges and the back-edge k == i (DimeNet convention,
    torch_geometric DimeNetPlusPlus triplets()).
    """
    b, a, k = nl.idx.shape
    # vector j→i for edge (j→i) stored at [b,i,n] is -diff[b,i,n]
    v_ji = -nl.unit  # [B,A,K,3] unit vector from j to i
    # for each (i,n): neighbor rows of j = idx[b,i,n]
    u_jk = gather_nodes(nl.unit, nl.idx)  # [B,A,K,K,3]: unit j→k for k=idx[j,m]
    cos = jnp.einsum("bikc,bikmc->bikm", v_ji, u_jk)
    cos = jnp.clip(cos, -1.0, 1.0)
    # mask: edge (j→i) valid, edge (k→j) valid, and k != i
    e2_mask = gather_nodes(nl.mask, nl.idx)  # [B,A,K,K]
    k_idx = gather_nodes(nl.idx, nl.idx)  # [B,A,K,K] node index of k
    i_idx = jnp.arange(a, dtype=nl.idx.dtype)[None, :, None, None]
    trip_mask = nl.mask[..., None] & e2_mask & (k_idx != i_idx)
    return cos, trip_mask


def edge_rotation_vectors(
    unit: jnp.ndarray, mask: jnp.ndarray, key: Optional[jax.Array] = None
) -> jnp.ndarray:
    """Stable per-edge frame: returns unit vectors with masked rows -> ẑ.

    Downstream SO(3)→SO(2) edge alignment (eSCN/EquiformerV2) builds Wigner
    rotations from these; padding edges get the identity-friendly ẑ.
    """
    zhat = jnp.zeros_like(unit).at[..., 2].set(1.0)
    return jnp.where(mask[..., None], unit, zhat)


class PBCNeighborList(NamedTuple):
    """Fixed-K neighbor view under periodic boundary conditions.

    Same consumer contract as :class:`NeighborList` (idx/mask/diff/dist/unit;
    ``idx`` addresses the *sender atom*, ``diff`` already includes the lattice
    shift of the selected periodic image), plus the integer image offset so
    edge identities (j, i, offset) stay recoverable.
    """

    idx: jnp.ndarray  # [B, A, K] int32 sender atom
    mask: jnp.ndarray  # [B, A, K] bool
    diff: jnp.ndarray  # [B, A, K, 3]  pos[j] + offset@cell - pos[i]
    dist: jnp.ndarray  # [B, A, K]
    unit: jnp.ndarray  # [B, A, K, 3]
    offset: jnp.ndarray  # [B, A, K, 3] int32 lattice image of the sender


def pbc_image_offsets(n_images: int = 1) -> np.ndarray:
    """Integer lattice offsets for periodic images, lexicographic over
    ``range(-n, n+1)^3`` so that ``offsets[o] == -offsets[O-1-o]`` — offset
    negation (the counter-edge map) is exactly index reversal, which keeps
    edge symmetrization a pure slice-reverse on the image axis."""
    r = range(-n_images, n_images + 1)
    return np.array(list(itertools.product(r, r, r)), dtype=np.int32)


def pbc_neighbor_list(
    pos: jnp.ndarray,
    node_mask: jnp.ndarray,
    cell: jnp.ndarray,
    cutoff: float,
    max_neighbors: int,
    n_images: int = 1,
    pbc: Tuple[bool, bool, bool] = (True, True, True),
    symmetrize: bool = True,
) -> PBCNeighborList:
    """Strict top-k in-cutoff neighbors under periodic boundary conditions.

    TPU-native replacement for the reference's host-side
    ``radius_graph_pbc`` + ``symmetrize_edges`` pair (painn_pyg/utils.py:318,
    painn_pyg/painn.py:157-304): instead of building ragged edge lists with
    data-dependent image counts on the host, candidates live on a static
    ``[B, A, A, O]`` lattice (O = (2·n_images+1)^3 periodic images of each
    sender) and selection is one ``lax.top_k`` over the flattened (A·O)
    candidate axis — fixed shapes, fused on device.

      * ``cell``: [B, 3, 3], rows are lattice vectors (ASE convention).
      * Self-pairs are excluded only in the home image (an atom genuinely
        neighbors its own periodic copies).
      * Axes with ``pbc[axis] == False`` admit only offset-0 images.
      * ``symmetrize=True`` reproduces the reference's counter-edge
        guarantee (every kept edge (j→i, S) has its mirror (i→j, −S)):
        the selected-edge mask is OR-ed with its transpose (image axis
        reversed — see :func:`pbc_image_offsets`) and the list rebuilt.
        The reference *grows* the ragged edge list when mirrors are added
        (painn.py:246-258); the static-shape analog used here is a 2K
        output budget for the symmetrized list (farther edges are dropped
        nearest-first in the pathological case where a receiver accrues
        more than 2K candidates). With nablaDFT-scale cutoff graphs
        (K ≥ A) no truncation occurs and symmetry is exact.
    """
    b, a = pos.shape[:2]
    offsets = pbc_image_offsets(n_images)  # [O, 3] numpy, static
    keep = np.ones(len(offsets), dtype=bool)
    for ax in range(3):
        if not pbc[ax]:
            keep &= offsets[:, ax] == 0
    # keep the image axis length static: disallowed images are masked, not
    # dropped, so offset-negation stays index reversal
    allowed = jnp.asarray(keep)
    offs = jnp.asarray(offsets, jnp.float32)  # [O, 3]
    n_off = len(offsets)
    center = n_off // 2  # the (0,0,0) image

    shifts = jnp.einsum("ox,bxy->boy", offs, cell.astype(jnp.float32))  # [B,O,3]
    # diff[b,i,j,o] = pos[j] + shift[o] - pos[i]
    diff = (
        pos[:, None, :, None, :] + shifts[:, None, None, :, :] - pos[:, :, None, None, :]
    )  # [B, A, A, O, 3]
    pair = node_mask[:, :, None] & node_mask[:, None, :]  # [B, A, A]
    self_home = jnp.eye(a, dtype=bool)[None, :, :, None] & (
        jnp.arange(n_off) == center
    )[None, None, None, :]
    cand = pair[..., None] & allowed[None, None, None, :] & ~self_home
    d2 = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, _EPS))
    adj = cand & (dist < cutoff)

    k = min(max_neighbors, a * n_off)

    def _select(adj_mask, kk):
        neg = jnp.where(adj_mask, -dist, -_BIG).reshape(b, a, a * n_off)
        vals, flat = jax.lax.top_k(neg, kk)  # [B, A, K]
        mask = vals > -_BIG * 0.5
        j_idx = (flat // n_off).astype(jnp.int32)
        o_idx = (flat % n_off).astype(jnp.int32)
        return j_idx, o_idx, mask, flat

    j_idx, o_idx, mask, flat = _select(adj, k)
    if symmetrize:
        # selected-edge mask scattered back onto the candidate lattice
        sel = (
            jnp.zeros((b, a, a * n_off), bool)
            .at[jnp.arange(b)[:, None, None], jnp.arange(a)[None, :, None], flat]
            .set(mask)
            .reshape(b, a, a, n_off)
        )
        # counter-edge of (receiver i, sender j, image o) is
        # (receiver j, sender i, image O-1-o)
        sel_t = jnp.flip(jnp.swapaxes(sel, 1, 2), axis=-1)
        sym = (sel | sel_t) & adj
        # the mirrors can push a receiver past its original budget; the
        # reference grows the ragged edge list (painn.py:246-258), the
        # static-shape analog is a 2K output budget (a receiver's
        # symmetrized candidates are its own K plus mirrors of edges where
        # it was the sender — ≤ K per counterpart in practice)
        j_idx, o_idx, mask, flat = _select(sym, min(2 * k, a * n_off))

    bi = jnp.arange(b)[:, None, None]
    ii = jnp.arange(a)[None, :, None]
    dsel = diff[bi, ii, j_idx, o_idx]  # [B, A, K, 3]
    dd = dist[bi, ii, j_idx, o_idx]
    dd = jnp.where(mask, dd, 0.0)
    unit = jnp.where(mask[..., None], dsel / jnp.maximum(dd, _EPS)[..., None], 0.0)
    dsel = jnp.where(mask[..., None], dsel, 0.0)
    off_sel = jnp.asarray(offsets)[o_idx] * mask[..., None].astype(jnp.int32)
    return PBCNeighborList(
        idx=j_idx, mask=mask, diff=dsel, dist=dd, unit=unit, offset=off_sel
    )


def dense_from_neighbor_list(nl: NeighborList, a_dim: int):
    """Scatter a top-K neighbor list onto the dense [B, A, A] pair lattice.

    Returns (mask_d [B,A,A] float 0/1, unit_d [B,A,A,3], dist_d [B,A,A]).
    The fused Pallas layer kernels (escn_layer / eqv2_attn) consume dense
    pair tables; scattering from the SAME top-K list keeps their graphs
    identical to the XLA paths'.
    """
    onehot = jax.nn.one_hot(nl.idx, a_dim, dtype=jnp.float32)
    onehot = onehot * nl.mask[..., None]
    mask_d = jnp.einsum("bakj->baj", onehot)
    unit_d = jnp.einsum("bakj,bakx->bajx", onehot, nl.unit)
    dist_d = jnp.einsum("bakj,bak->baj", onehot, nl.dist)
    return mask_d, unit_d, dist_d
