"""PhiSNet: SE(3)-equivariant wavefunction model predicting H, S and C.

TPU-native rebuild of reference nablaDFT/phisnet (nn/neural_network.py:31-995,
nn/modules/: modular_block, pair_mixing, residual stacks; nablaDFT presets
phisnet/configs/args_nablaDFT_*: order=4, 128 features, 128 exp-Bernstein
basis functions, 5 modules, cutoff 15 Bohr, swish).

Architecture (faithful to the reference's data flow, SURVEY §2.4):
  * per-L spherical feature stacks x[L]: [B,A,C,2L+1];
  * `num_modules` interaction modules: residual pre/post stacks around a
    message step coupling neighbor features with rbf·Y^L(û) filters; module
    outputs accumulate into output features fs;
  * the **overlap matrix S** is predicted from an environment-independent
    branch (embeddings + angular functions only) — it must not depend on
    the chemical environment, only geometry (neural_network.py:752-778);
  * full and core Hamiltonians come from environment-dependent pair (fij)
    and diagonal (fii) features, with neighbor-influence terms;
  * matrix assembly per shell pair via the same CG expansion as QHNet
    (`models.qhnet.Expansion`), symmetrized.

Coordinates for the Hamiltonian task are Bohr (Hamiltonian DB convention).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.models.qhnet import (
    DEF2_SVP_ORBITALS,
    Expansion,
    IrrepsLinear,
    OrbitalLayout,
    expansion_weight_counts,
)
from nabladft_tpu.ops import graph, so3
from nabladft_tpu.ops.radial import ExpBernsteinRBF


class ResidualStack(nn.Module):
    """PhiSNet residual MLP acting per-L (scalar path nonlinear, higher-L
    mixed linearly with scalar gating — phisnet nn/modules/residual*.py)."""

    n_blocks: int
    channels: int

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        c = self.channels
        for b in range(self.n_blocks):
            gates = nn.Dense(len(xs) * c, name=f"gate_{b}")(
                jax.nn.silu(xs[0][..., 0])
            )
            parts = jnp.split(gates, len(xs), axis=-1)
            new = []
            for l, x in enumerate(xs):
                h = jnp.swapaxes(x, -1, -2)
                h = nn.Dense(c, use_bias=(l == 0), name=f"lin_{b}_{l}")(h)
                h = jnp.swapaxes(h, -1, -2)
                new.append(x + h * jax.nn.sigmoid(parts[l])[..., None])
            xs = new
        return xs


class PairMixing(nn.Module):
    """Combine features of atoms i and j with radial weights
    (phisnet nn/modules/pair_mixing.py)."""

    channels: int

    @nn.compact
    def __call__(self, fi, fj, rbf):
        out = []
        for l, (a, b) in enumerate(zip(fi, fj)):
            w1 = nn.Dense(self.channels, use_bias=False, name=f"rad_i_{l}")(rbf)
            w2 = nn.Dense(self.channels, use_bias=False, name=f"rad_j_{l}")(rbf)
            out.append(a * w1[..., None] + b * w2[..., None])
        return out


class PhiSNetModule(nn.Module):
    """One interaction module: pre-residuals, neighbor message with
    rbf × Y^L filters, post-residuals; returns (new state, output features)
    (phisnet nn/modules/modular_block.py)."""

    order: int
    channels: int

    @nn.compact
    def __call__(self, xs, rbf, sh, adj):
        c = self.channels
        xs = ResidualStack(1, c, name="pre_x")(xs)
        vi = ResidualStack(1, c, name="pre_vi")(xs)
        vj = ResidualStack(1, c, name="pre_vj")(xs)
        # messages: for each pair (i,j): radial-weighted vj plus angular
        # (spherical-harmonic) terms sourced from scalar channels of vj
        msgs = []
        for l in range(self.order + 1):
            w = nn.Dense(c, use_bias=False, name=f"rad_{l}")(rbf)  # [B,A,A,C]
            w = jnp.where(adj[..., None], w, 0.0)
            feat_j = vj[l][:, None, :, :, :]  # [B,1,A,C,2l+1]
            term = jnp.einsum("bijc,bijcm->bicm", w, jnp.broadcast_to(
                feat_j, (*adj.shape, c, 2 * l + 1)
            ))
            # angular source: scalar channel of vj modulated by Y^l(û_ij)
            wa = nn.Dense(c, use_bias=False, name=f"rad_ang_{l}")(rbf)
            wa = jnp.where(adj[..., None], wa, 0.0)
            s_j = vj[0][:, None, :, :, 0]  # [B,1,A,C]
            ang = jnp.einsum(
                "bijc,bijm->bicm", wa * s_j, sh[l]
            )
            msgs.append(term + ang)
        xs = [x + m for x, m in zip(vi, msgs)]
        xs = ResidualStack(1, c, name="post_x")(xs)
        ys = ResidualStack(1, c, name="output")(xs)
        return xs, ys


@register_model("phisnet")
class PhiSNet(nn.Module):
    """Defaults follow phisnet/configs/args_nablaDFT_*_separate.txt."""

    order: int = 4
    num_features: int = 128
    num_basis_functions: int = 128
    num_modules: int = 5
    cutoff: float = 15.0  # Bohr
    num_elements: int = 87
    orbitals: Optional[Dict[int, Tuple[int, ...]]] = None
    predict_core: bool = True
    predict_overlap: bool = True
    # energy/forces heads alongside the matrices (reference
    # nn/neural_network.py:969-991 + nn/modules/energy_layer.py:35-50:
    # energy from pooled diagonal+pair scalar features, forces = -dE/dpos)
    predict_energy: bool = False
    num_energy_features: int = 64
    remat: bool = True

    @property
    def derivative_forces(self) -> bool:
        return self.predict_energy

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        c = self.num_features
        L = self.order
        layout = OrbitalLayout(self.orbitals or DEF2_SVP_ORBITALS, self.num_elements)
        o_max = batch.orb_mask.shape[-1] if batch.orb_mask is not None else None

        dg = graph.dense_graph(batch.pos, batch.node_mask, self.cutoff)
        adj = dg.adj
        dist = jnp.where(adj, dg.dist, 0.0)
        unit = jnp.where(adj[..., None], dg.diff / jnp.maximum(dg.dist, 1e-9)[..., None], 0.0)
        rbf = ExpBernsteinRBF(self.num_basis_functions, self.cutoff, name="rbf")(dist)
        rbf = jnp.where(adj[..., None], rbf, 0.0)
        sh_flat = so3.real_sph_harm(unit, L, normalized=False)
        sh = [sh_flat[..., l * l : (l + 1) * (l + 1)] for l in range(L + 1)]

        emb = nn.Embed(self.num_elements, c, name="embedding")(batch.z)
        xs = [emb[..., None]] + [
            jnp.zeros((*batch.z.shape, c, 2 * l + 1), emb.dtype) for l in range(1, L + 1)
        ]

        # ---------------- environment-independent overlap branch ----------
        out: ModelOutput = {}
        if self.predict_overlap:
            fii_over = ResidualStack(2, c, name="res_over_ii")(xs)
            fii_over = IrrepsLinear(c, name="output_over_ii")(fii_over)
            # pair features: x_i radial-mixed with pure angular functions
            fi0 = [jnp.broadcast_to(x[:, :, None], (*adj.shape, c, x.shape[-1])) for x in xs]
            ang = [
                jnp.broadcast_to(sh[l][..., None, :], (*adj.shape, c, 2 * l + 1))
                for l in range(L + 1)
            ]
            sij = PairMixing(c, name="mix_s")(fi0, ang, rbf)
            fij_over = ResidualStack(2, c, name="res_over_ij")(sij)
            fij_over = IrrepsLinear(c, name="output_over_ij")(fij_over)
            out["overlap_parts"] = (fii_over, fij_over)

        # ---------------- environment-dependent modules -------------------
        fs = [jnp.zeros_like(x) for x in xs]
        mod_cls = nn.remat(PhiSNetModule) if self.remat else PhiSNetModule
        for m in range(self.num_modules):
            xs, ys = mod_cls(L, c, name=f"module_{m}")(xs, rbf, sh, adj)
            fs = [f + y for f, y in zip(fs, ys)]

        fpc = ResidualStack(1, c, name="res_pc")(fs)
        fpn = ResidualStack(1, c, name="res_pn")(fs)

        # diagonal features: central + radial-weighted neighbor influence
        fii = []
        for l in range(L + 1):
            w = nn.Dense(c, use_bias=False, name=f"radial_ii_{l}")(rbf)
            w = jnp.where(adj[..., None], w, 0.0)
            nbr = jnp.einsum("bijc,bjcm->bicm", w, fpn[l])
            fii.append(fpc[l] + nbr)
        fii = ResidualStack(1, c, name="res_ii")(fii)

        # off-diagonal pair features
        fi = [jnp.broadcast_to(x[:, :, None], (*adj.shape, c, x.shape[-1])) for x in fpc]
        fj = [jnp.broadcast_to(x[:, None, :], (*adj.shape, c, x.shape[-1])) for x in fpc]
        fij = PairMixing(c, name="mix_ij")(fi, fj, rbf)
        fij = ResidualStack(1, c, name="res_ij")(fij)

        out_extra: ModelOutput = {}
        if self.predict_energy:
            # reference EnergyLayer: mean-pooled activated scalar channels of
            # the diagonal and pair features -> one linear readout
            e_ii = jax.nn.silu(
                nn.Dense(self.num_energy_features, name="energy_ii")(fii[0][..., 0])
            )  # [B,A,E]
            nmaskf = batch.node_mask.astype(e_ii.dtype)
            e_ii = (e_ii * nmaskf[..., None]).sum(1) / jnp.maximum(
                nmaskf.sum(1), 1.0
            )[..., None]
            e_ij = jax.nn.silu(
                nn.Dense(self.num_energy_features, name="energy_ij")(fij[0][..., 0])
            )  # [B,A,A,E]
            amaskf = adj.astype(e_ij.dtype)
            e_ij = (e_ij * amaskf[..., None]).sum((1, 2)) / jnp.maximum(
                amaskf.sum((1, 2)), 1.0
            )[..., None]
            energy = nn.Dense(1, name="energy_out")(
                jnp.concatenate([e_ii, e_ij], axis=-1)
            )[..., 0]
            out_extra["energy"] = energy

        heads = [("hamiltonian", 2)]
        if self.predict_core:
            heads.append(("core", 2))
        n_w, n_b = expansion_weight_counts(layout, c, l_in_max=L)
        blocks: Dict[str, Tuple] = {}
        for name, n_res in heads:
            hii = ResidualStack(n_res, c, name=f"res_{name}_ii")(fii)
            hii = IrrepsLinear(c, name=f"output_{name}_ii")(hii)
            hij = ResidualStack(n_res, c, name=f"res_{name}_ij")(fij)
            hij = IrrepsLinear(c, name=f"output_{name}_ij")(hij)
            blocks[name] = (hii, hij)
        if self.predict_overlap:
            blocks["overlap"] = out.pop("overlap_parts")

        if o_max is None:
            return {**{k: v for k, v in blocks.items()}, **out_extra}

        # ---------------- matrix assembly ---------------------------------
        norb_t = jnp.asarray(layout.norb)
        valid_t = jnp.asarray(layout.valid)
        rank_t = jnp.asarray(layout.rank)
        norb = jnp.where(batch.node_mask, norb_t[batch.z], 0)
        offsets = jnp.cumsum(norb, axis=1) - norb
        tgt = offsets[..., None] + rank_t[batch.z]
        v = valid_t[batch.z] & batch.node_mask[..., None]
        p = jax.nn.one_hot(jnp.where(v, tgt, o_max), o_max, dtype=emb.dtype)
        p = p * v[..., None]
        eye = jnp.eye(adj.shape[1], dtype=bool)

        result: ModelOutput = {}
        for name, (hii, hij) in blocks.items():
            w_ii = nn.Dense(n_w, name=f"w_ii_{name}")(jax.nn.silu(hii[0][..., 0]))
            b_ii = nn.Dense(n_b, name=f"b_ii_{name}")(jax.nn.silu(hii[0][..., 0]))
            w_ij = nn.Dense(n_w, name=f"w_ij_{name}")(jax.nn.silu(hij[0][..., 0]))
            b_ij = nn.Dense(n_b, name=f"b_ij_{name}")(jax.nn.silu(hij[0][..., 0]))
            diag = Expansion(layout, name=f"expand_ii_{name}")(hii, w_ii, b_ii)
            offd = Expansion(layout, name=f"expand_ij_{name}")(hij, w_ij, b_ij)
            offd = jnp.where(
                ~eye[None, :, :, None, None] & adj[..., None, None], offd, 0.0
            )
            mat = jnp.einsum("biro,birs,bisq->boq", p, diag, p)
            mat = mat + jnp.einsum("biro,bijrs,bjsq->boq", p, offd, p)
            mat = 0.5 * (mat + jnp.swapaxes(mat, -1, -2))
            result[name] = mat
        result.update(out_extra)
        return result
