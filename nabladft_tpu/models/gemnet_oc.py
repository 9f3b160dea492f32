"""GemNet-OC: multi-interaction message passing (triplets + quadruplets).

TPU-native rebuild of reference nablaDFT/gemnet_oc (gemnet_oc.py:39-1345 +
layers/: interaction_block.py, efficient.py, basis layers, scale_factor.py;
config/model/gemnet-oc.yaml: 4 blocks, 256/512 atom/edge channels, all four
auxiliary interactions enabled, direct coupled forces, Gaussian radial ×
polynomial envelope, spherical-harmonic circular basis, Legendre-outer
quadruplet basis, K=30 main / 8 quad / 20 atom-edge neighbors).

TPU re-design highlights:
  * the reference builds triplet/quadruplet index arrays on device per
    batch (interaction_indices.py:13-280, SparseTensor adjacency);
    here all interaction geometry is composed gathers over fixed-K
    neighbor lists — zero dynamic index construction;
  * "efficient bilinear" basis factorization is replaced by direct dense
    contractions (at ≤64-atom molecules the MXU prefers one big einsum);
  * forces_coupled symmetrization (gemnet_oc.py:1216-1245) is a scatter of
    per-edge force scalars into the dense [B,A,A] pair matrix followed by
    0.5(S+Sᵀ) — exact, no reverse-edge index search;
  * ScaleFactors are plain learned scalars initialized at 1 (the reference
    fits them from data when scale_file is provided; scale_basis=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.ops import graph, radial
from nabladft_tpu.ops.spherical import legendre_polynomials


def _scale(module: nn.Module, name: str, x: jnp.ndarray) -> jnp.ndarray:
    s = module.param(name, nn.initializers.ones, ())
    return x * s


class Residual(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(nn.Dense(self.units, use_bias=False)(x))
        h = jax.nn.silu(nn.Dense(self.units, use_bias=False)(h))
        return (x + h) * (2**-0.5)


def res_stack(x, n, units, name_prefix):
    for i in range(n):
        x = Residual(units, name=f"{name_prefix}_{i}")(x)
    return x


class TripletInteraction(nn.Module):
    """Edge←edge messages over angles at the shared atom
    (reference layers/interaction_block.py TripletInteraction)."""

    emb_edge: int
    emb_in: int
    emb_out: int
    emb_cbf: int

    @nn.compact
    def __call__(self, m, nl, cbf, trip_mask):
        # m: [B,A,K,E]; cbf: [B,A,K,K,F_cbf]; mask over (edge, neighbor-edge)
        x = jax.nn.silu(nn.Dense(self.emb_in, use_bias=False, name="dense_db")(m))
        x_kj = graph.gather_neighbor_edges(x, nl.idx)  # [B,A,K,K,Ein]
        w = nn.Dense(self.emb_in, use_bias=False, name="mlp_cbf")(cbf)
        agg = jnp.sum(jnp.where(trip_mask[..., None], x_kj * w, 0.0), axis=3)
        agg = _scale(self, "scale_cbf_sum", agg)
        x = jax.nn.silu(nn.Dense(self.emb_out, use_bias=False, name="down")(agg))
        x = jax.nn.silu(nn.Dense(self.emb_edge, use_bias=False, name="up")(x))
        return x


class QuadrupletInteraction(nn.Module):
    """Edge←edge messages over 3-hop chains l→k→j→i with two bend angles
    and the dihedral (reference QuadrupletInteraction + its host-built
    quadruplet id arrays, interaction_indices.py:164-280).

    The chain is composed from gathers: for main edge (j→i) at [b,i,k1],
    second hops are the Kq nearest edges (k→j) (rows of j), third hops the
    Kq nearest edges (l→k) (rows of k). Messages are sourced from the
    far edge's embedding, down-projected *before* the chain gathers so the
    [B,A,K,Kq,Kq,·] tensor stays at `emb_in` width.
    """

    emb_edge: int
    emb_in: int
    emb_out: int

    @nn.compact
    def __call__(self, m, sbf, x_far_gather, quad_mask):
        # x_far_gather: callable mapping [B,A,Kq,Ein] -> [B,A,K,Kq,Kq,Ein]
        x = jax.nn.silu(nn.Dense(self.emb_in, use_bias=False, name="dense_db")(m))
        x_far = x_far_gather(x)
        w = nn.Dense(self.emb_in, use_bias=False, name="mlp_sbf")(sbf)
        agg = jnp.sum(jnp.where(quad_mask[..., None], x_far * w, 0.0), axis=(3, 4))
        agg = _scale(self, "scale_sbf_sum", agg)
        x = jax.nn.silu(nn.Dense(self.emb_out, use_bias=False, name="down")(agg))
        x = jax.nn.silu(nn.Dense(self.emb_edge, use_bias=False, name="up")(x))
        return x


class AtomEdgeInteraction(nn.Module):
    """Atom→edge: edges read their endpoints' atom embeddings with radial
    weights (reference PairInteraction / atom_edge_interaction)."""

    emb_edge: int
    emb_rbf: int

    @nn.compact
    def __call__(self, h, m, nl, rbf):
        h_j = graph.gather_nodes(h, nl.idx)  # [B,A,K,H]
        w = nn.Dense(h.shape[-1], use_bias=False, name="mlp_rbf")(rbf)
        msg = h_j * w
        msg = _scale(self, "scale_rbf", msg)
        return jax.nn.silu(nn.Dense(self.emb_edge, use_bias=False, name="proj")(msg))


class EdgeAtomInteraction(nn.Module):
    """Edge→atom aggregation with radial weights."""

    emb_atom: int

    @nn.compact
    def __call__(self, m, nl, rbf):
        w = nn.Dense(m.shape[-1], use_bias=False, name="mlp_rbf")(rbf)
        agg = jnp.sum(jnp.where(nl.mask[..., None], m * w, 0.0), axis=2)
        agg = _scale(self, "scale_sum", agg)
        return jax.nn.silu(nn.Dense(self.emb_atom, use_bias=False, name="proj")(agg))


class AtomInteraction(nn.Module):
    """Atom→atom over the (near-full) aint graph with radial weights."""

    emb_atom: int

    @nn.compact
    def __call__(self, h, adj, rbf_dense):
        # adj: [B,A,A]; rbf_dense: [B,A,A,R]
        w = nn.Dense(h.shape[-1], use_bias=False, name="mlp_rbf")(rbf_dense)
        msg = jnp.where(adj[..., None], w * h[:, None, :, :], 0.0)
        agg = msg.sum(axis=2)
        agg = _scale(self, "scale_sum", agg)
        return jax.nn.silu(nn.Dense(self.emb_atom, use_bias=False, name="proj")(agg))


class OutputBlock(nn.Module):
    """Per-block energy + direct-force contributions
    (reference layers/interaction_block.py OutputBlock)."""

    emb_atom: int
    emb_edge: int
    num_atom_layers: int

    @nn.compact
    def __call__(self, h, m, nl, rbf):
        # atom (energy) branch: edge→atom with rbf weights then MLP
        w = nn.Dense(self.emb_edge, use_bias=False, name="mlp_rbf_out")(rbf)
        agg = jnp.sum(jnp.where(nl.mask[..., None], m * w, 0.0), axis=2)
        agg = _scale(self, "scale_out_sum", agg)
        x_e = jax.nn.silu(nn.Dense(self.emb_atom, use_bias=False, name="atom_proj")(agg))
        x = h + x_e
        x = res_stack(x, self.num_atom_layers, self.emb_atom, "atom_res")
        # force branch: per-edge scalar
        f = res_stack(m, 2, self.emb_edge, "force_res")
        f_scalar = nn.Dense(1, use_bias=False, name="force_out")(f)[..., 0]  # [B,A,K]
        return x, f_scalar


@register_model("gemnet_oc")
class GemNetOC(nn.Module):
    """Defaults follow reference config/model/gemnet-oc.yaml."""

    num_blocks: int = 4
    emb_size_atom: int = 256
    emb_size_edge: int = 512
    emb_size_trip_in: int = 64
    emb_size_trip_out: int = 64
    emb_size_quad_in: int = 32
    emb_size_quad_out: int = 32
    emb_size_rbf: int = 16
    emb_size_cbf: int = 16
    emb_size_sbf: int = 32
    num_radial: int = 128
    num_spherical: int = 7
    num_spherical_quad: int = 4
    num_before_skip: int = 2
    num_after_skip: int = 2
    num_atom: int = 3
    num_global_out_layers: int = 2
    cutoff: float = 12.0
    cutoff_qint: float = 12.0
    cutoff_aint: float = 12.0
    max_neighbors: int = 30
    max_neighbors_qint: int = 8
    max_neighbors_aeaint: int = 20
    num_elements: int = 100
    envelope_exponent: int = 5
    quad_interaction: bool = True
    atom_edge_interaction: bool = True
    edge_atom_interaction: bool = True
    atom_interaction: bool = True
    forces_coupled: bool = True
    remat: bool = True

    derivative_forces = False  # direct forces (config direct_forces: true)

    def _rbf(self, d):
        env = radial.polynomial_envelope(d / self.cutoff, self.envelope_exponent)
        return radial.gaussian_rbf(d, self.num_radial, self.cutoff) * env[..., None]

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        a_dim = batch.z.shape[1]
        # in the shipped config all four cutoffs coincide at 12 Å
        # (gemnet-oc.yaml:32-35), so the qint/aeaint graphs are prefixes of
        # the main strict-top-k neighbor list (top_k sorts by distance) —
        # one neighbor list serves all interaction graphs.
        nl = graph.neighbor_list(batch.pos, batch.node_mask, self.cutoff, self.max_neighbors)
        dg = graph.dense_graph(batch.pos, batch.node_mask, self.cutoff_aint)

        rbf = jnp.where(nl.mask[..., None], self._rbf(nl.dist), 0.0)
        rbf_dense = jnp.where(
            dg.adj[..., None], self._rbf(jnp.where(dg.adj, dg.dist, 0.0)), 0.0
        )

        # circular basis: triplets k→j→i on the main graph
        cos_t, trip_mask = graph.triplet_angles(nl)
        leg_t = legendre_polynomials(cos_t, self.num_spherical - 1)
        d_kj = graph.gather_nodes(nl.dist, nl.idx)
        rad_t = jnp.where(
            trip_mask[..., None], self._rbf(d_kj)[..., : self.emb_size_cbf], 0.0
        )
        cbf = jnp.einsum("bikms,bikmr->bikmsr", leg_t, rad_t)
        cbf = _scale(self, "scale_cbf_basis", cbf.reshape(*cbf.shape[:-2], -1))

        # quadruplet geometry: chains l→k→j→i (two bends + dihedral)
        if self.quad_interaction:
            kq = self.max_neighbors_qint
            sq = self.num_spherical_quad
            idx_j = nl.idx  # [B,A,K] node j of edge (j→i)
            idx_k = graph.gather_nodes(nl.idx[:, :, :kq], idx_j)  # [B,A,K,Kq]
            mask_2 = graph.gather_nodes(nl.mask[:, :, :kq], idx_j)
            v2 = graph.gather_nodes(nl.unit[:, :, :kq], idx_j)  # j→k
            idx_l = graph.gather_nodes(nl.idx[:, :, :kq], idx_k)  # [B,A,K,Kq,Kq]
            mask_3 = graph.gather_nodes(nl.mask[:, :, :kq], idx_k)
            v3 = graph.gather_nodes(nl.unit[:, :, :kq], idx_k)  # k→l
            v1 = -nl.unit  # j→i
            cos_1 = jnp.clip(jnp.einsum("bikc,bikqc->bikq", v1, v2), -1, 1)
            cos_2 = jnp.clip(jnp.einsum("bikqc,bikqpc->bikqp", -v2, v3), -1, 1)
            # dihedral between planes (i,j,k) and (j,k,l)
            n1 = jnp.cross(jnp.broadcast_to(v1[..., None, :], v2.shape), v2)
            n2 = jnp.cross(
                jnp.broadcast_to(-v2[..., None, :], v3.shape), v3
            )
            n1n = jnp.linalg.norm(n1, axis=-1, keepdims=True)
            n2n = jnp.linalg.norm(n2, axis=-1)
            cos_d = jnp.einsum(
                "bikqc,bikqpc->bikqp",
                n1 / jnp.maximum(n1n, 1e-9),
                n2 / jnp.maximum(n2n[..., None], 1e-9),
            )
            cos_d = jnp.clip(cos_d, -1, 1)
            leg_1 = legendre_polynomials(cos_1, sq - 1)  # [B,A,K,Kq,Sq]
            leg_2 = legendre_polynomials(cos_2, sq - 1)  # [B,A,K,Kq,Kq,Sq]
            leg_d = legendre_polynomials(cos_d, sq - 1)
            outer = jnp.einsum("bikqs,bikqpt->bikqpst", leg_1, leg_2)
            outer = outer.reshape(*outer.shape[:-2], sq * sq)
            quad_basis = jnp.concatenate([outer, leg_d], axis=-1)
            # degenerate-chain exclusions: k ≠ i, l ≠ j
            i_ids = jnp.arange(a_dim)[None, :, None, None]
            quad_mask = (
                nl.mask[..., None, None]
                & mask_2[..., None]
                & mask_3
                & (idx_k != i_ids)[..., None]
                & (idx_l != idx_j[..., None, None])
            )
            sbf = nn.Dense(self.emb_size_sbf, use_bias=False, name="sbf_proj")(quad_basis)
            sbf = _scale(self, "scale_sbf_basis", sbf)

            def x_far_gather(x):
                return graph.gather_nodes(x[:, :, :kq], idx_k)

        h = nn.Embed(self.num_elements, self.emb_size_atom, name="atom_emb")(batch.z)
        h_j = graph.gather_nodes(h, nl.idx)
        h_i = jnp.broadcast_to(h[:, :, None], h_j.shape)
        m = jax.nn.silu(
            nn.Dense(self.emb_size_edge, name="edge_emb")(
                jnp.concatenate([h_i, h_j, rbf], axis=-1)
            )
        )

        e_out = jnp.zeros((*batch.z.shape, self.emb_size_atom))
        f_out = jnp.zeros(nl.mask.shape)
        x0, f0 = OutputBlock(
            self.emb_size_atom, self.emb_size_edge, self.num_atom, name="out_0"
        )(h, m, nl, rbf)
        e_out, f_out = e_out + x0, f_out + f0

        for b in range(self.num_blocks):
            m_new = TripletInteraction(
                self.emb_size_edge, self.emb_size_trip_in, self.emb_size_trip_out,
                self.emb_size_cbf, name=f"trip_{b}",
            )(m, nl, cbf, trip_mask)
            contributions = [m_new]
            if self.quad_interaction:
                contributions.append(
                    QuadrupletInteraction(
                        self.emb_size_edge, self.emb_size_quad_in,
                        self.emb_size_quad_out, name=f"quad_{b}",
                    )(m, sbf, x_far_gather, quad_mask)
                )
            if self.atom_edge_interaction:
                contributions.append(
                    AtomEdgeInteraction(
                        self.emb_size_edge, self.emb_size_rbf, name=f"ae_{b}"
                    )(h, m, nl, rbf)
                )
            m = (m + sum(contributions)) * (len(contributions) + 1) ** -0.5
            m = res_stack(m, self.num_before_skip, self.emb_size_edge, f"before_{b}")
            m = res_stack(m, self.num_after_skip, self.emb_size_edge, f"after_{b}")

            atom_contrib = []
            if self.edge_atom_interaction:
                atom_contrib.append(
                    EdgeAtomInteraction(self.emb_size_atom, name=f"ea_{b}")(m, nl, rbf)
                )
            if self.atom_interaction:
                atom_contrib.append(
                    AtomInteraction(self.emb_size_atom, name=f"aa_{b}")(
                        h, dg.adj, rbf_dense
                    )
                )
            if atom_contrib:
                h = (h + sum(atom_contrib)) * (len(atom_contrib) + 1) ** -0.5

            x_b, f_b = OutputBlock(
                self.emb_size_atom, self.emb_size_edge, self.num_atom, name=f"out_{b + 1}"
            )(h, m, nl, rbf)
            e_out, f_out = e_out + x_b, f_out + f_b

        # energy head: global MLP over summed atom contributions (extensive)
        e = e_out
        for i in range(self.num_global_out_layers):
            e = jax.nn.silu(nn.Dense(self.emb_size_atom, use_bias=False, name=f"out_e_{i}")(e))
        e_atom = nn.Dense(1, use_bias=False, name="energy_out")(e)[..., 0]
        energy = jnp.sum(jnp.where(batch.node_mask, e_atom, 0.0), axis=1)

        # direct forces with optional coupling symmetrization
        f_scalar = jnp.where(nl.mask, f_out, 0.0)  # [B,A,K]
        if self.forces_coupled:
            onehot = jax.nn.one_hot(nl.idx, a_dim, dtype=f_scalar.dtype)
            s_dense = jnp.einsum("bika,bik->bia", onehot, f_scalar)  # [B,A,A]
            s_dense = 0.5 * (s_dense + jnp.swapaxes(s_dense, -1, -2))
            # gather symmetrized scalars back to the edge lattice
            f_scalar = jnp.take_along_axis(s_dense, nl.idx, axis=2)
            f_scalar = jnp.where(nl.mask, f_scalar, 0.0)
        forces = jnp.sum(f_scalar[..., None] * nl.unit, axis=2)  # [B,A,3]
        forces = forces * batch.node_mask[..., None]
        return {"energy": energy, "forces": forces}
