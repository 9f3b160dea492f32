"""PaiNN: polarizable atom interaction NN (scalar + vector features).

Covers both reference flavors with one module:
  * schnetpack PaiNN (config/model/painn.yaml: Gaussian RBF 100, cosine
    cutoff 5.0, 6 interactions, 128 channels) — ``rbf="gaussian"``,
    ``envelope="cosine"``;
  * painn_pyg "PAINN-OC" (config/model/painn-oc.yaml + painn_pyg/painn.py:22:
    Gaussian RBF, polynomial envelope p=5, max_neighbors cap) —
    ``envelope="polynomial"``.

TPU-native formulation: nablaDFT molecules are ≤ 62 atoms, so messages are
computed over the **dense pair axis** [B, A, A] instead of gather/scatter
edge lists (reference painn_pyg uses torch_cluster radius_graph + scatter,
painn.py:115-128). The message block is the entire cost of the model; it
runs in one of three modes:

  * ``use_pallas="off"``   — pure XLA (arbitrary-order AD; the correctness
    baseline and the path for direct second-order training off-TPU);
  * ``use_pallas="fused"`` — fused Pallas kernels with a custom VJP that
    folds the radial-basis chain rule into a scalar g_dist (first-order
    paths: inference, force evaluation, relaxation, MD — and the force
    pass of surrogate training);
  * ``use_pallas="train"`` — custom-JVP op that expands to a fused
    dual-number kernel under jax.jvp; combined with the engine's surrogate
    force-gradient formulation this makes the whole training step run in
    fused kernels (see ops/pallas/painn_fused.py and
    train/engine.py force_grads="pallas").

State: scalars s [B,A,F] and equivariant vectors v [B,A,3,F]. Equivariance
is kept by never applying bias or nonlinearity to the vector channel.
Forces are -∂E/∂pos (reference painn.py:130-146 autograd semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import MLP, ModelOutput, register_model, shifted_softplus
from nabladft_tpu.ops import graph, radial
from nabladft_tpu.ops.pallas.painn_fused import (
    painn_message,
    painn_message_reference,
    painn_message_train,
)
from nabladft_tpu.ops.graph import dense_topk_mask  # noqa: F401  (re-export)
from nabladft_tpu.ops.segment import masked_sum


class PaiNNMessage(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "off"  # off | fused | train

    @nn.compact
    def __call__(self, s, v, feats):
        """feats: dict with dist, rbf_env [B,A,A,R], rbfp, unit_t [B,A,3,A],
        envf [B,A,A] (premasked cutoff envelope). rbf_env/rbfp premasked.

        PBC mode (feats carries an ``nl`` PBCNeighborList): the same
        parameters applied over a [B,A,K] neighbor-list lattice, where each
        of the K slots is a (sender atom, periodic image) candidate — the
        TPU analog of the reference's edge-list message passing over
        radius_graph_pbc output (painn_pyg/painn.py:420-468). Checkpoints
        are layout-independent: identical parameter tree in both modes.
        """
        f = self.hidden
        r = feats["rbf_env"].shape[-1]
        phi = MLP([f, 3 * f], dtype=self.dtype)(s)  # [B,A,3F] (node-level)
        w = self.param("filter_kernel", nn.initializers.lecun_normal(), (r, 3 * f))
        b = self.param("filter_bias", nn.initializers.zeros, (3 * f,))
        v_flat = v.reshape(*v.shape[:2], 3 * f)  # [B,A,3,F] -> c-major flat
        wc = w.astype(self.dtype)
        if feats.get("nl") is not None:
            nl = feats["nl"]
            bc = b.astype(self.dtype)
            # per-edge filter (rbf@W + b)·env; rbf_env/envf are premasked so
            # padded slots contribute exactly zero
            filt = feats["rbf_env"] @ wc + bc * feats["envf"][..., None]
            phi_j = graph.gather_nodes(phi, nl.idx)  # [B,A,K,3F]
            v_j = graph.gather_nodes(v_flat, nl.idx)  # [B,A,K,3F]
            prod = filt * phi_j
            ds = jnp.sum(prod[..., :f], axis=2)
            prod1 = prod[..., f : 2 * f]
            dv_flat = jnp.concatenate(
                [jnp.sum(prod1 * v_j[..., c * f : (c + 1) * f], axis=2) for c in range(3)],
                axis=-1,
            )
            dvu = jnp.einsum("bikc,bikf->bicf", nl.unit.astype(prod.dtype), prod[..., 2 * f :])
            dv_flat = dv_flat + dvu.reshape(*ds.shape[:2], 3 * f)
            return ds, dv_flat.reshape(*v.shape)
        if self.use_pallas == "off":
            ds, dv_flat = painn_message_reference(
                feats["rbf_env"], phi, v_flat, feats["unit_t"], wc
            )
        else:
            interpret = jax.default_backend() == "cpu"
            op = painn_message_train if self.use_pallas == "train" else painn_message
            ds, dv_flat = op(
                feats["dist"], feats["rbf_env"], feats["rbfp"],
                phi, v_flat, feats["unit_t"], wc, interpret,
            )
        # bias terms, bypassing the radial basis: schnetpack's filter is
        # (rbf@W + b)·env (PaiNN filter_net * cutoff), so the bias rides the
        # envelope: b ⊙ Σ_j env_ij·φ_j(-like). Kept outside the kernels
        # (cheap [A,A]@[A,F] MXU contractions) so the kernels see
        # bias-free, premasked messages.
        bc = b.astype(self.dtype)
        adjf = feats["envf"]
        phi1 = phi[..., f : 2 * f]
        q = jnp.concatenate(
            [phi[..., :f]]
            + [phi1 * v_flat[..., c * f : (c + 1) * f] for c in range(3)],
            axis=-1,
        )  # [B,A,4F]: φ0 and φ1⊙v_c
        nb = jnp.einsum("bij,bjk->bik", adjf, q)
        ds = ds + bc[:f] * nb[..., :f]
        dv_flat = dv_flat + jnp.concatenate(
            [bc[f : 2 * f] * nb[..., (c + 1) * f : (c + 2) * f] for c in range(3)],
            axis=-1,
        )
        dvu_b = jnp.einsum(
            "bicj,bjf->bicf",
            feats["unit_t"] * feats["envf"][:, :, None, :],
            phi[..., 2 * f :],
        )
        dv_flat = dv_flat + (bc[2 * f :] * dvu_b).reshape(*ds.shape[:2], 3 * f)
        return ds, dv_flat.reshape(*v.shape)


class PaiNNUpdate(nn.Module):
    hidden: int
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s, v):
        f = self.hidden
        # channel mixes of the vector features (no bias: equivariance)
        u = nn.Dense(f, use_bias=False, dtype=self.dtype)(v)  # [B,A,3,F]
        vv = nn.Dense(f, use_bias=False, dtype=self.dtype)(v)
        vv_norm = jnp.sqrt(jnp.sum((vv * vv).astype(jnp.float32), axis=-2) + self.eps)
        gates = MLP([f, 3 * f], dtype=self.dtype)(
            jnp.concatenate([s, vv_norm.astype(s.dtype)], axis=-1)
        )
        a_vv, a_sv, a_ss = jnp.split(gates, 3, axis=-1)
        dv = u * a_vv[:, :, None, :]
        dot = jnp.sum(u * vv, axis=-2)  # [B,A,F]
        ds = a_ss + a_sv * dot
        return ds, dv


class PaiNNLayer(nn.Module):
    """One message+update interaction (remat unit)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "off"

    @nn.compact
    def __call__(self, s, v, feats):
        ds, dv = PaiNNMessage(
            self.hidden, dtype=self.dtype, use_pallas=self.use_pallas, name="message"
        )(s, v, feats)
        s, v = s + ds, v + dv
        ds, dv = PaiNNUpdate(self.hidden, dtype=self.dtype, name="update")(s, v)
        return s + ds, v + dv


@register_model("painn")
class PaiNN(nn.Module):
    hidden: int = 128
    n_interactions: int = 6
    n_rbf: int = 100
    cutoff: float = 5.0
    max_neighbors: int = 63
    num_elements: int = 100
    rbf: str = "gaussian"  # gaussian | bessel
    envelope: str = "polynomial"  # polynomial | cosine
    envelope_exponent: int = 5
    energy_mean: float = 0.0
    energy_std: float = 1.0
    remat: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # fused Pallas message kernels: "off" = pure XLA (any-order AD);
    # "fused" = custom-VJP kernels for first-order paths (~2x);
    # "train" = custom-JVP dual kernels for the surrogate training pass
    # (engine force_grads="pallas"). "full" is a legacy alias of "fused".
    use_pallas: str = "off"
    # periodic boundary conditions (reference painn_pyg use_pbc,
    # painn.py:37/419: radius_graph_pbc + symmetrize_edges). Requires
    # batch.cell; runs the XLA neighbor-list message path (the fused dense
    # kernels are the molecular hot path — nablaDFT data has no PBC).
    pbc: bool = False
    pbc_images: int = 1

    derivative_forces = True

    def _mode(self) -> str:
        return "fused" if self.use_pallas == "full" else self.use_pallas

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        f = self.hidden
        mode = self._mode()
        cdt = jnp.dtype(self.compute_dtype)
        if self.pbc:
            if batch.cell is None:
                raise ValueError("PaiNN(pbc=True) requires batch.cell [B,3,3]")
            mode = "off"  # the PBC path is plain XLA (see class docstring)

        def filt(d, edge_mask):
            if self.rbf == "gaussian":
                rb = radial.gaussian_rbf(d, self.n_rbf, self.cutoff)
            else:
                rb = radial.bessel_rbf(d, self.n_rbf, self.cutoff)
            if self.envelope == "polynomial":
                env = radial.polynomial_envelope(d / self.cutoff, self.envelope_exponent)
            else:
                env = radial.cosine_cutoff(d, self.cutoff)
            return jnp.where(edge_mask[..., None], rb * env[..., None], 0.0).astype(cdt)

        def envelope(d, edge_mask):
            if self.envelope == "polynomial":
                envp = radial.polynomial_envelope(d / self.cutoff, self.envelope_exponent)
            else:
                envp = radial.cosine_cutoff(d, self.cutoff)
            return jnp.where(edge_mask, envp, 0.0).astype(cdt)

        if self.pbc:
            nl = graph.pbc_neighbor_list(
                batch.pos, batch.node_mask, batch.cell, self.cutoff,
                self.max_neighbors, n_images=self.pbc_images, symmetrize=True,
            )
            feats = {
                "nl": nl,
                "dist": nl.dist,
                "envf": envelope(nl.dist, nl.mask),
                "rbf_env": filt(nl.dist, nl.mask),
                "rbfp": None,
                "unit_t": None,
            }
        else:
            dg = graph.dense_graph(batch.pos, batch.node_mask, self.cutoff)
            adj = dense_topk_mask(dg.dist, dg.adj, self.max_neighbors)
            dist = jnp.where(adj, dg.dist, 0.0)
            unit = jnp.where(
                adj[..., None], dg.diff / jnp.maximum(dg.dist, 1e-10)[..., None], 0.0
            )
            unit_t = jnp.swapaxes(unit, 2, 3)  # [B,A,3,A] for the kernels' MXU u-term
            feats = {
                "dist": dist,
                "envf": envelope(dist, adj),
                "unit_t": unit_t.astype(cdt),
                "rbfp": None,
            }
            if mode == "off":
                feats["rbf_env"] = filt(dist, adj)
            elif mode == "fused":
                # the kernel VJP folds the basis chain rule into g_dist, so the
                # basis tensors themselves must not carry an AD graph
                rbf_env, rbfp = jax.jvp(
                    lambda d: filt(d, adj), (dist,), (jnp.ones_like(dist),)
                )
                feats["rbf_env"] = jax.lax.stop_gradient(rbf_env)
                feats["rbfp"] = jax.lax.stop_gradient(rbfp)
            else:  # train: rbf tangents must flow into the dual kernel
                feats["rbf_env"] = filt(dist, adj)
                feats["rbfp"] = jnp.zeros((), cdt)  # unused by the train op

        s = nn.Embed(self.num_elements, f, dtype=cdt, name="atom_embedding")(batch.z)
        v = jnp.zeros((*s.shape[:2], 3, f), cdt)

        layer_cls = nn.remat(PaiNNLayer) if (self.remat and mode == "off") else PaiNNLayer
        for i in range(self.n_interactions):
            s, v = layer_cls(
                f, dtype=cdt, use_pallas=mode, name=f"layer_{i}"
            )(s, v, feats)

        e_atom = MLP([f // 2, 1], activation=shifted_softplus, name="energy_head")(
            s.astype(jnp.float32)
        )[..., 0]  # schnetpack Atomwise outnet uses shifted softplus
        e_atom = e_atom * self.energy_std + self.energy_mean
        energy = masked_sum(e_atom, batch.node_mask, axis=1)
        return {"energy": energy}
