"""DimeNet++: directional message passing with triplet angular bases.

Reimplements what the reference composes from
`torch_geometric.nn.models.DimeNetPlusPlus` plus its potential wrapper
(nablaDFT/dimenetplusplus/dimenetplusplus.py:22-116: per-graph latent →
swish MLP head → scaler postprocessing, forces via autograd).

TPU design: edge messages live on the fixed-K neighbor axis
([B, A, K, H]); the triplet aggregation k→j→i is a gather over the
neighbor list (`ops.graph.gather_neighbor_edges`) followed by a masked
contraction over the second neighbor axis — the [B,A,K,K,·] intermediate is
produced and consumed inside one fused XLA loop instead of the reference's
host-precomputed triplet index arrays. Interaction blocks are wrapped in
`jax.checkpoint` to keep the double-backward (forces) memory bounded.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.ops import graph
from nabladft_tpu.ops.segment import masked_sum
from nabladft_tpu.ops.radial import dimenet_bessel_rbf
from nabladft_tpu.ops.spherical import dimenet_spherical_basis


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResidualLayer(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = swish(nn.Dense(self.hidden, dtype=self.dtype)(x))
        h = swish(nn.Dense(self.hidden, dtype=self.dtype)(h))
        return x + h


class InteractionPPBlock(nn.Module):
    hidden: int
    int_emb_size: int
    basis_emb_size: int
    num_before_skip: int
    num_after_skip: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, m, rbf, sbf, nl: graph.NeighborList, trip_mask):
        # m: [B,A,K,H] message of edge (j->i); rbf: [B,A,K,R]; sbf: [B,A,K,K,S*R]
        dt = self.dtype
        # explicit names mirror torch_geometric InteractionPPBlock fields
        # (lin_ji/lin_kj/lin_rbf1/lin_rbf2/lin_down/lin_sbf1/lin_sbf2/lin_up)
        x_ji = swish(nn.Dense(self.hidden, dtype=dt, name="lin_ji")(m))
        x_kj = swish(nn.Dense(self.hidden, dtype=dt, name="lin_kj")(m))
        rbf_w = nn.Dense(self.hidden, use_bias=False, dtype=dt, name="rbf2")(
            nn.Dense(self.basis_emb_size, use_bias=False, dtype=dt, name="rbf1")(rbf)
        )
        x_kj = x_kj * rbf_w
        x_kj = swish(nn.Dense(self.int_emb_size, use_bias=False, dtype=dt,
                              name="down")(x_kj))
        # triplet aggregation: agg[.. k, e] =
        #   Σ_{k2,c} s8[.. k, k2, c] · w2[c, e] · x_kj[b, idx[.. k], k2, e]
        # Both paths share this parameterization (identical checkpoint
        # layout); s8 inherits the trip_mask zeros from sbf, so invalid
        # triplets contribute nothing without explicit masks.
        s8 = nn.Dense(self.basis_emb_size, use_bias=False, dtype=dt,
                      name="sbf1")(sbf)
        w2 = self.param(
            "sbf2_kernel", nn.initializers.lecun_normal(),
            (self.basis_emb_size, self.int_emb_size),
        )
        if self.use_pallas:
            from nabladft_tpu.ops.pallas.dimenet_triplet import triplet_agg

            agg = triplet_agg(s8, x_kj, w2, nl.idx)  # [B,A,K,E] fp32
        else:
            # gather messages of edges (k->j) for each edge (j->i)
            t = graph.gather_neighbor_edges(x_kj, nl.idx)  # [B,A,K,K,E]
            sbf_w = jnp.einsum("bakqc,ce->bakqe", s8, w2.astype(dt))
            agg = jnp.sum(
                jnp.where(trip_mask[..., None], t * sbf_w, 0.0), axis=3
            )  # [B,A,K,E]
        x_kj = swish(nn.Dense(self.hidden, use_bias=False, dtype=dt,
                              name="up")(agg.astype(dt)))

        h = x_ji + x_kj
        for k in range(self.num_before_skip):
            h = ResidualLayer(self.hidden, dtype=dt, name=f"before_skip_{k}")(h)
        h = swish(nn.Dense(self.hidden, dtype=dt, name="skip")(h)) + m
        for k in range(self.num_after_skip):
            h = ResidualLayer(self.hidden, dtype=dt, name=f"after_skip_{k}")(h)
        return h


class OutputPPBlock(nn.Module):
    hidden: int
    out_emb_channels: int
    out_channels: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, rbf, nl: graph.NeighborList):
        dt = self.dtype
        g = nn.Dense(self.hidden, use_bias=False, dtype=dt,
                     name="lin_rbf")(rbf) * m  # [B,A,K,H]
        x = masked_sum(g, nl.mask, axis=2).astype(dt)  # [B,A,H] receiver agg
        x = nn.Dense(self.out_emb_channels, use_bias=False, dtype=dt,
                     name="lin_up")(x)
        for k in range(self.num_layers):
            x = swish(nn.Dense(self.out_emb_channels, dtype=dt, name=f"lin_{k}")(x))
        return nn.Dense(self.out_channels, use_bias=False, dtype=dt,
                        name="lin_out")(x)


@register_model("dimenetpp")
class DimeNetPP(nn.Module):
    """Defaults follow reference config/model/dimenetplusplus.yaml."""

    node_latent_dim: int = 50
    hidden: int = 256
    num_blocks: int = 6
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_channels: int = 256
    num_spherical: int = 7
    num_radial: int = 6
    max_neighbors: int = 32
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    cutoff: float = 5.0
    num_elements: int = 100
    energy_mean: float = 0.0
    energy_std: float = 1.0
    remat: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # fused triplet-aggregation kernels (ops/pallas/dimenet_triplet): the
    # [B,A,K,K,int_emb] lattice never hits HBM; differentiable to all
    # orders (mutually-recursive custom VJPs), so reverse-over-reverse
    # forces work. "auto" = on for TPU. Same param layout as the XLA path.
    use_pallas: Union[bool, str] = "auto"

    derivative_forces = True

    def _pallas_enabled(self) -> bool:
        if self.use_pallas == "auto":
            return jax.default_backend() != "cpu"
        return bool(self.use_pallas)

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        cdt = jnp.dtype(self.compute_dtype)
        nl = graph.neighbor_list(batch.pos, batch.node_mask, self.cutoff, self.max_neighbors)
        # trainable Bessel frequencies (torch_geometric BesselBasisLayer
        # stores `rbf.freq` as a parameter; init n·π)
        freqs = self.param(
            "rbf_freq",
            lambda _: jnp.arange(1, self.num_radial + 1, dtype=jnp.float32) * jnp.pi,
        )
        rbf = dimenet_bessel_rbf(
            nl.dist, self.num_radial, self.cutoff, self.envelope_exponent,
            freqs=freqs,
        )
        cos_angle, trip_mask = graph.triplet_angles(nl)
        d_kj = graph.gather_nodes(nl.dist, nl.idx)  # [B,A,K,K]
        sbf = dimenet_spherical_basis(
            d_kj, cos_angle, self.num_spherical, self.num_radial, self.cutoff,
            self.envelope_exponent,
        )
        sbf = jnp.where(trip_mask[..., None], sbf, 0.0).astype(cdt)
        rbf = jnp.where(nl.mask[..., None], rbf, 0.0).astype(cdt)

        # embedding block
        x = nn.Embed(self.num_elements, self.hidden, dtype=cdt, name="atom_embedding")(batch.z)
        x_j = graph.gather_nodes(x, nl.idx)
        x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
        rbf_emb = swish(nn.Dense(self.hidden, dtype=cdt, name="rbf_embed")(rbf))
        m = swish(
            nn.Dense(self.hidden, dtype=cdt, name="edge_embed")(
                jnp.concatenate([x_i, x_j, rbf_emb], axis=-1)
            )
        )

        p = OutputPPBlock(
            self.hidden, self.out_emb_channels, self.node_latent_dim,
            self.num_output_layers, dtype=cdt, name="output_0",
        )(m, rbf, nl)
        block_cls = nn.remat(InteractionPPBlock) if self.remat else InteractionPPBlock
        pallas_on = self._pallas_enabled()
        for b in range(self.num_blocks):
            m = block_cls(
                self.hidden, self.int_emb_size, self.basis_emb_size,
                self.num_before_skip, self.num_after_skip, dtype=cdt,
                use_pallas=pallas_on, name=f"interaction_{b}",
            )(m, rbf, sbf, nl, trip_mask)
            p = p + OutputPPBlock(
                self.hidden, self.out_emb_channels, self.node_latent_dim,
                self.num_output_layers, dtype=cdt, name=f"output_{b + 1}",
            )(m, rbf, nl)

        # per-graph latent -> swish MLP head (reference dimenetplusplus.py:83-91)
        latent = masked_sum(p, batch.node_mask, axis=1).astype(jnp.float32)
        h = swish(nn.Dense(self.node_latent_dim)(latent))
        h = swish(nn.Dense(self.node_latent_dim // 2)(h))
        h = swish(nn.Dense(self.node_latent_dim // 2)(h))
        energy = nn.Dense(1)(h)[..., 0]
        energy = energy * self.energy_std + self.energy_mean
        return {"energy": energy}
