"""Graphormer3D: dense all-pairs transformer with Gaussian edge bias.

Reimplements the reference nablaDFT/graphormer/graphormer_3d.py:227-321
(Graphormer3D-small config: 4 blocks × 6 shared layers, 512 dim, 32 heads,
128 Gaussian kernels, direct forces via the attention-weighted Δpos
NodeTaskHead, graphormer_3d.py:185-225).

This architecture is the most natural fit for the TPU of the whole zoo: the
reference already pads to dense [B, A] batches (`to_dense_batch`) — here
batches are born dense, so the model is pure batched matmul + softmax with
a padding mask, no graph construction at all. Energy aggregation masks
padded atoms via the tag embedding exactly like the reference (tags==1 for
real atoms, 0 for padding).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model


def _gelu(x):
    """Exact (erf) GELU — torch F.gelu parity; jax.nn.gelu defaults to the
    tanh approximation, which breaks converted-checkpoint parity."""
    return jax.nn.gelu(x, approximate=False)


class GaussianEdgeLayer(nn.Module):
    """Per-edge-type affine of distance -> K gaussian kernels
    (reference GaussianLayer, graphormer_3d.py:126-146)."""

    num_kernels: int
    num_edge_types: int

    @nn.compact
    def __call__(self, dist, edge_type):
        mul = nn.Embed(self.num_edge_types, 1, embedding_init=nn.initializers.ones)(
            edge_type
        )[..., 0]
        bias = nn.Embed(self.num_edge_types, 1, embedding_init=nn.initializers.zeros)(
            edge_type
        )[..., 0]
        x = mul * dist + bias  # [B,A,A]
        means = self.param(
            "means", nn.initializers.uniform(3.0), (self.num_kernels,), jnp.float32
        )
        stds = self.param(
            "stds", nn.initializers.uniform(3.0), (self.num_kernels,), jnp.float32
        )
        std = jnp.abs(stds) + 1e-5
        z = (x[..., None] - means) / std
        return jnp.exp(-0.5 * z * z) / (math.sqrt(2 * math.pi) * std)


class EncoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    heads: int
    dropout: float
    attention_dropout: float
    activation_dropout: float
    deterministic: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        # pre-LN self attention with additive bias [B,H,A,A]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        d_head = self.embed_dim // self.heads
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, d_head)

        q = split_heads(q) * d_head**-0.5
        k, v = split_heads(k), split_heads(v)
        logits = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32) + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.attention_dropout, deterministic=self.deterministic)(probs)
        attn = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(self.dtype))
        attn = attn.reshape(*x.shape[:-1], self.embed_dim)
        attn = nn.Dense(self.embed_dim, dtype=self.dtype)(attn)
        x = x + nn.Dropout(self.dropout, deterministic=self.deterministic)(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = _gelu(nn.Dense(self.ffn_dim, dtype=self.dtype)(h))
        h = nn.Dropout(self.activation_dropout, deterministic=self.deterministic)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        return x + nn.Dropout(self.dropout, deterministic=self.deterministic)(h)


class NodeForceHead(nn.Module):
    """Direct forces: attention probs × Δpos unit vectors × values
    (reference NodeTaskHead, graphormer_3d.py:185-225)."""

    embed_dim: int
    heads: int
    deterministic: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, unit):
        dt = self.dtype
        d_head = self.embed_dim // self.heads
        q = nn.Dense(self.embed_dim, dtype=dt)(x).reshape(
            *x.shape[:-1], self.heads, d_head)
        k = nn.Dense(self.embed_dim, dtype=dt)(x).reshape(
            *x.shape[:-1], self.heads, d_head)
        v = nn.Dense(self.embed_dim, dtype=dt)(x).reshape(
            *x.shape[:-1], self.heads, d_head)
        # logits/softmax stay fp32 (additive -1e9 bias under bf16 would
        # collapse the probability floor)
        logits = jnp.einsum(
            "bihd,bjhd->bhij", q * d_head**-0.5, k
        ).astype(jnp.float32) + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        probs = nn.Dropout(0.1, deterministic=self.deterministic)(probs)
        # rot_attn[b,h,c,i,j] = probs * unit[...,c]; contract j with v
        feat = jnp.einsum("bhij,bijc,bjhd->bichd", probs, unit.astype(dt), v)
        feat = feat.astype(jnp.float32)
        feat = feat.reshape(*x.shape[:-1], 3, self.embed_dim)
        fx = nn.Dense(1)(feat[..., 0, :])
        fy = nn.Dense(1)(feat[..., 1, :])
        fz = nn.Dense(1)(feat[..., 2, :])
        return jnp.concatenate([fx, fy, fz], axis=-1)  # [B,A,3]


@register_model("graphormer3d")
class Graphormer3D(nn.Module):
    """Defaults = reference config/model/graphormer3d-small.yaml."""

    blocks: int = 4
    layers: int = 6
    embed_dim: int = 512
    ffn_embed_dim: int = 512
    attention_heads: int = 32
    input_dropout: float = 0.1
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.1
    num_kernel: int = 128
    atom_types: int = 64
    deterministic: bool = True
    remat: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # per-atom energy standardization (reference AddOffsets analog)
    energy_mean: float = 0.0
    energy_std: float = 1.0

    derivative_forces = False  # direct force head

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        z = jnp.where(batch.node_mask, batch.z, 0)
        tags = batch.node_mask.astype(jnp.int32)  # 1 = real atom, 0 = padding
        # reference delta_pos[b,i,j] = pos_j - pos_i (graphormer_3d.py:283)
        diff = batch.pos[:, None, :, :] - batch.pos[:, :, None, :]
        dist = jnp.linalg.norm(diff, axis=-1)
        unit = diff / (dist[..., None] + 1e-5)

        edge_type = z[:, :, None] * self.atom_types + z[:, None, :]
        gbf = GaussianEdgeLayer(self.num_kernel, self.atom_types**2, name="gbf")(
            dist, edge_type
        )  # [B,A,A,K]
        # zero edge features where the *sender* is padding (reference
        # masked_fill on padding_mask.unsqueeze(1), i.e. axis 2)
        edge_feat = jnp.where(batch.node_mask[:, None, :, None], gbf, 0.0)

        cdt = jnp.dtype(self.compute_dtype)
        x = (
            nn.Embed(3, self.embed_dim, dtype=cdt, name="tag_encoder")(tags)
            + nn.Embed(self.atom_types, self.embed_dim, dtype=cdt, name="atom_encoder")(z)
            + nn.Dense(self.embed_dim, dtype=cdt, name="edge_proj")(
                edge_feat.sum(axis=2).astype(cdt)
            )
        )
        x = nn.Dropout(self.input_dropout, deterministic=self.deterministic)(x)

        # additive attention bias: -inf on padding senders. The gbf→bias
        # chain is the step's largest non-attention lattice ([B,A,A,128]);
        # it follows compute_dtype, with the final bias cast back to fp32
        # where it joins the fp32 attention logits.
        bias = _gelu(nn.Dense(self.num_kernel, dtype=cdt,
                              name="bias_proj_0")(gbf.astype(cdt)))
        bias = nn.Dense(self.attention_heads, dtype=cdt, name="bias_proj_1")(bias)
        bias = jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.float32)  # [B,H,A,A]
        neg_inf = jnp.asarray(-1e9, jnp.float32)
        bias = jnp.where(batch.node_mask[:, None, None, :], bias, neg_inf)

        layer_cls = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        shared_layers = [
            layer_cls(
                self.embed_dim, self.ffn_embed_dim, self.attention_heads,
                self.dropout, self.attention_dropout, self.activation_dropout,
                self.deterministic, cdt, name=f"layer_{i}",
            )
            for i in range(self.layers)
        ]
        for _ in range(self.blocks):  # weight-shared blocks (reference :303)
            for layer in shared_layers:
                x = layer(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x.astype(jnp.float32))

        e = nn.Dropout(0.1, deterministic=self.deterministic)(x)
        e = _gelu(nn.Dense(self.embed_dim, name="energy_proj_0")(e))
        e = nn.Dense(1, name="energy_proj_1")(e)[..., 0]
        agg = nn.Embed(
            3, 1, embedding_init=nn.initializers.normal(0.01), name="energy_agg_factor"
        )(tags)[..., 0]
        # Standardize FIRST, mask SECOND: masking before adding energy_mean
        # would add (A - n_atoms) * energy_mean from padded slots to the
        # molecular sum (per-atom DFT means are ~-10^1 Eh, so this dominated
        # the prediction for any padded batch).
        e_atom = (e * agg * self.energy_std + self.energy_mean) * batch.node_mask
        energy = e_atom.sum(axis=1)

        forces = NodeForceHead(
            self.embed_dim, self.attention_heads, self.deterministic, cdt,
            name="force_head"
        )(x, bias, unit)
        forces = forces * batch.node_mask[..., None]
        return {"energy": energy, "forces": forces}
