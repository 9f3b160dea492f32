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
  * quadruplet topology is the reference's c–a–b–d star (c a neighbor of
    the receiver a=i, d a neighbor of the sender b=j) with the two bend
    angles cosφ_cab / cosφ_abd and the plane dihedral θ_cabd
    (gemnet_oc.py:597-663 calculate_quad_angles) and the legendre_outer
    basis circ(cosφ_cab) ⊗ circ(cos θ) (layers/spherical_basis.py:104);
  * the "efficient bilinear" factorization (layers/efficient.py) maps to
    two einsum contractions: the basis is first contracted against the
    gathered messages on the MXU, then reduced against the basis embedding
    — the [.., K, K, E] basis-times-message product never materializes;
  * forces_coupled symmetrization (gemnet_oc.py:1216-1245) is a scatter of
    per-edge force scalars into the dense [B,A,A] pair matrix followed by
    0.5(S+Sᵀ) — exact, no reverse-edge index search;
  * ScaleFactors live in a non-trainable "scales" variable collection and
    are FITTED FROM DATA exactly like the reference
    (layers/scale_factor.py:29-160: scale = sqrt(var_ref / var_out),
    variance over the batch axis, mean over features):
    `fit_scale_factors` runs forward passes with the "scale_stats"
    collection mutable and iterates the ratio to a fixed point. The
    trainer freezes the collection during optimization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.ops import graph, radial, so3
from nabladft_tpu.ops.spherical import legendre_polynomials


def _scale(module: nn.Module, name: str, x: jnp.ndarray, ref=None) -> jnp.ndarray:
    """Apply a data-fitted scale factor (reference ScaleFactor.forward,
    layers/scale_factor.py:139-160). During `fit_scale_factors` the
    batch-variance statistics of (scaled output, reference tensor) are
    recorded into the mutable "scale_stats" collection."""
    s = module.variable("scales", name, lambda: jnp.ones((), jnp.float32))
    y = x * s.value.astype(x.dtype)
    if module.is_mutable_collection("scale_stats"):
        yf = y.astype(jnp.float32)
        var_out = jnp.var(yf, axis=0).mean()
        if ref is None:
            var_ref = jnp.asarray(1.0, jnp.float32)
        else:
            var_ref = jnp.var(ref.astype(jnp.float32), axis=0).mean()
        module.variable(
            "scale_stats", name, lambda: jnp.zeros((2,), jnp.float32)
        ).value = jnp.stack([var_out, var_ref])
    return y


def fit_scale_factors(model, variables, batches, rounds: int = 2):
    """Fit all ScaleFactors from data (reference scale_factor.py fit_():
    scale ← scale · sqrt(var_ref / var_out), iterated because the observed
    output variance already includes the current scale). Returns updated
    variables."""
    if "scales" not in variables:
        return variables
    for _ in range(rounds):
        acc = {}
        for batch in batches:
            _, mut = model.apply(variables, batch, mutable=["scale_stats"])
            flat = jax.tree_util.tree_flatten_with_path(mut["scale_stats"])[0]
            for path, val in flat:
                key = tuple(getattr(p, "key", str(p)) for p in path)
                v = np.asarray(val)
                out, ref = acc.get(key, (0.0, 0.0))
                acc[key] = (out + float(v[0]), ref + float(v[1]))

        def update(path, s):
            key = tuple(getattr(p, "key", str(p)) for p in path)
            out, ref = acc.get(key, (1.0, 1.0))
            ratio = ref / max(out, 1e-12)
            return s * np.sqrt(max(ratio, 1e-12))

        scales = jax.tree_util.tree_map_with_path(update, variables["scales"])
        variables = {**variables, "scales": scales}
    return variables


class Residual(nn.Module):
    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(nn.Dense(self.units, use_bias=False, dtype=self.dtype)(x))
        h = jax.nn.silu(nn.Dense(self.units, use_bias=False, dtype=self.dtype)(h))
        return (x + h) * (2**-0.5)


def res_stack(x, n, units, name_prefix, dtype=jnp.float32):
    for i in range(n):
        x = Residual(units, dtype=dtype, name=f"{name_prefix}_{i}")(x)
    return x


class TripletInteraction(nn.Module):
    """Edge←edge messages over angles at the shared atom
    (reference layers/interaction_block.py TripletInteraction).

    Production path: the Legendre-addition-theorem factorization (the same
    trick as models/dimenetpp.py) —

      agg[b,i,n,e] = Σ_m Σ_{s,r} P_s(cosθ_{inm})·rad[b,j,m,r]·w[sr,e]·x[b,j,m,e]
                   = Σ_{s,μ} c_s·Y_sμ(û_ij)·V[b,j,(s,μ),e] − backedge_corr

    with V[b,j,(s,μ),e] = Σ_m Y_sμ(û_jm)·(Σ_r rad·w)[b,j,m,s,e]·x[b,j,m,e]
    per sender node j. The [B,A,K,M,S] circular-basis lattice (620 MB at
    bench shape, the dominant HBM term of the old step) never exists —
    everything is pair-shaped matmuls; the k == i exclusion (trip_mask's
    only non-factorizable term, P_s(1) = 1) is an exact reverse-edge
    correction like DimeNet++'s.

    The explicit-lattice path is kept ONLY for ScaleFactor fitting
    (mutable "scale_stats"), so the fitted statistics keep the reference's
    semantics (variance of the cbf tensor / of the gathered x_kj)."""

    emb_edge: int
    emb_in: int
    emb_out: int
    emb_cbf: int
    num_spherical: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, nl, trip):
        dt = self.dtype
        sq, rc = self.num_spherical, self.emb_cbf
        x = jax.nn.silu(nn.Dense(self.emb_in, use_bias=False, dtype=dt, name="dense_db")(m))
        w = self.param(
            "mlp_cbf", nn.initializers.he_normal(), (sq * rc, self.emb_in)
        ).astype(dt)

        if "cbf" in trip:
            # scale-fitting branch: explicit triplet lattice, records the
            # reference's variance statistics (cbf already carries the
            # fitted scale_cbf_basis and trip_mask premasking).
            x_kj = graph.gather_neighbor_edges(x, nl.idx)  # [B,A,K,M,Ein]
            cbf_m = jnp.where(trip["trip_mask"][..., None], trip["cbf"], 0.0).astype(dt)
            g = jnp.einsum("bikms,se->bikme", cbf_m, w)
            agg = jnp.einsum("bikme,bikme->bike", g, x_kj)
            agg = _scale(self, "scale_cbf_sum", agg, ref=x_kj)
        else:
            x = jnp.where(nl.mask[..., None], x, 0.0)
            w3 = w.reshape(sq, rc, self.emb_in)
            # per-(j,m) radial projection through the basis weight, then the
            # per-sender SH reduction V (block-diagonal in l)
            d_se = jnp.einsum("bakr,sre->bakse", trip["rad_e"], w3)
            ex = d_se * x[:, :, :, None, :]  # [B,A,K,S,Ein]
            y_e = trip["y_e"]
            v = jnp.concatenate(
                [
                    jnp.einsum(
                        "bakm,bake->bame",
                        y_e[..., l * l : (l + 1) * (l + 1)],
                        ex[..., l, :],
                    )
                    for l in range(sq)
                ],
                axis=2,
            )  # [B,A,(S)²,Ein]
            # close the triplet over the dense j axis (cheap), then gather
            # the K needed rows — the [B,A,K,(S)²,Ein] gather never exists
            agg_d = jnp.einsum("bijq,bjqe->bije", trip["yc_d"], v)
            agg = jnp.take_along_axis(agg_d, nl.idx[..., None], axis=2)
            # exact k == i back-triplet removal: P_s(1) = 1 for every s, the
            # back-edge distance is symmetric, x at the reverse edge comes
            # from one flat gather (rev_valid zeroes slots whose reverse
            # edge fell out of j's strict top-k — those triplets don't
            # exist in the explicit lattice either)
            cw = jnp.einsum("bakr,re->bake", trip["rad_e"], w3.sum(0))
            bsz, a_ax, k_ax, e_ax = x.shape
            x_rev = jnp.take_along_axis(
                x.reshape(bsz, a_ax * k_ax, e_ax),
                trip["rev_flat"].reshape(bsz, a_ax * k_ax)[..., None],
                axis=1,
            ).reshape(bsz, a_ax, k_ax, e_ax)
            x_rev = x_rev * trip["rev_valid"][..., None].astype(dt)
            agg = (agg - cw * x_rev) * trip["s_basis"].astype(dt)
            agg = jnp.where(nl.mask[..., None], agg, 0.0)
            agg = _scale(self, "scale_cbf_sum", agg)
        x = jax.nn.silu(nn.Dense(self.emb_out, use_bias=False, dtype=dt, name="down")(agg))
        x = jax.nn.silu(nn.Dense(self.emb_edge, use_bias=False, dtype=dt, name="up")(x))
        return x


class QuadrupletInteraction(nn.Module):
    """Edge←edge messages over the reference's c–a–b–d quadruplets
    (c ~ receiver i, d ~ sender j; gemnet_oc.py:597-663): source messages
    are the (d→j) edge embeddings, modulated by circ(cosφ_abd), then
    contracted against the legendre_outer basis circ(cosφ_cab)⊗circ(cosθ)
    with the efficient-bilinear order."""

    emb_edge: int
    emb_in: int
    emb_out: int
    num_spherical: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, nl, rbf, quad):
        dt = self.dtype
        sq = self.num_spherical
        cos_cab, cos_abd, cos_dih, mask_d, quad_mask = quad
        x = jax.nn.silu(nn.Dense(self.emb_in, use_bias=False, dtype=dt, name="dense_db")(m))
        w_rbf = nn.Dense(self.emb_in, use_bias=False, dtype=dt, name="mlp_rbf")(rbf)
        x = _scale(self, "scale_rbf", x * w_rbf, ref=x)
        kq = cos_abd.shape[-1]
        # source: embeddings of edges (d→j), rows of the sender j
        x_db = graph.gather_nodes(x[:, :, :kq], nl.idx)  # [B,A,K,D,Ein]
        # bend at the sender: circ(cosφ_abd) modulation
        leg_abd = legendre_polynomials(cos_abd, sq - 1).astype(dt)  # [B,A,K,D,Sq]
        w_cbf = self.param(
            "mlp_cbf", nn.initializers.he_normal(), (sq, self.emb_in)
        ).astype(dt)
        t = x_db * jnp.einsum("bikds,se->bikde", leg_abd, w_cbf)
        t = _scale(self, "scale_cbf_sum", jnp.where(mask_d[..., None], t, 0.0), ref=x_db)
        # legendre_outer over (cosφ_cab, cosθ): [B,A,K,C,D,Sq*Sq]
        leg_cab = legendre_polynomials(cos_cab, sq - 1).astype(dt)  # [B,A,K,C,Sq]
        leg_dih = legendre_polynomials(cos_dih, sq - 1).astype(dt)  # [B,A,K,C,D,Sq]
        w_sbf = self.param(
            "mlp_sbf", nn.initializers.he_normal(), (sq * sq, self.emb_in)
        ).astype(dt)
        leg_dih = jnp.where(quad_mask[..., None], leg_dih, 0.0)
        # efficient contraction: sum over (c, d) without materializing the
        # [.., C, D, Sq², Ein] product, then flatten (s,t) -> Sq² and
        # contract with the basis embedding
        r = jnp.einsum("bikcs,bikcdt,bikde->bikste", leg_cab, leg_dih, t)
        r2 = r.reshape(*r.shape[:3], sq * sq, r.shape[-1])
        agg = jnp.einsum("bikqe,qe->bike", r2, w_sbf)
        agg = _scale(self, "scale_sbf_sum", agg, ref=t)
        x = jax.nn.silu(nn.Dense(self.emb_out, use_bias=False, dtype=dt, name="down")(agg))
        x = jax.nn.silu(nn.Dense(self.emb_edge, use_bias=False, dtype=dt, name="up")(x))
        return x


class AtomEdgeInteraction(nn.Module):
    """Atom→edge: edges read their endpoints' atom embeddings with radial
    weights (reference PairInteraction / atom_edge_interaction)."""

    emb_edge: int
    emb_rbf: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, m, nl, rbf):
        h_j = graph.gather_nodes(h, nl.idx)  # [B,A,K,H]
        w = nn.Dense(h.shape[-1], use_bias=False, dtype=self.dtype, name="mlp_rbf")(rbf)
        msg = h_j * w
        msg = _scale(self, "scale_rbf", msg, ref=h_j)
        return jax.nn.silu(
            nn.Dense(self.emb_edge, use_bias=False, dtype=self.dtype, name="proj")(msg)
        )


class EdgeAtomInteraction(nn.Module):
    """Edge→atom aggregation with radial weights."""

    emb_atom: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m, nl, rbf):
        w = nn.Dense(m.shape[-1], use_bias=False, dtype=self.dtype, name="mlp_rbf")(rbf)
        agg = jnp.sum(jnp.where(nl.mask[..., None], m * w, 0.0), axis=2)
        agg = _scale(self, "scale_sum", agg, ref=m)
        return jax.nn.silu(
            nn.Dense(self.emb_atom, use_bias=False, dtype=self.dtype, name="proj")(agg)
        )


class AtomInteraction(nn.Module):
    """Atom→atom over the (near-full) aint graph with radial weights."""

    emb_atom: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, adj, rbf_dense):
        # adj: [B,A,A]; rbf_dense: [B,A,A,R]
        w = nn.Dense(h.shape[-1], use_bias=False, dtype=self.dtype, name="mlp_rbf")(rbf_dense)
        msg = jnp.where(adj[..., None], w * h[:, None, :, :], 0.0)
        agg = msg.sum(axis=2)
        agg = _scale(self, "scale_sum", agg, ref=h)
        return jax.nn.silu(
            nn.Dense(self.emb_atom, use_bias=False, dtype=self.dtype, name="proj")(agg)
        )


class OutputBlock(nn.Module):
    """Per-block energy + direct-force contributions
    (reference layers/interaction_block.py OutputBlock)."""

    emb_atom: int
    emb_edge: int
    num_atom_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, m, nl, rbf):
        dt = self.dtype
        # atom (energy) branch: edge→atom with rbf weights then MLP
        w = nn.Dense(self.emb_edge, use_bias=False, dtype=dt, name="mlp_rbf_out")(rbf)
        agg = jnp.sum(jnp.where(nl.mask[..., None], m * w, 0.0), axis=2)
        agg = _scale(self, "scale_out_sum", agg, ref=m)
        x_e = jax.nn.silu(nn.Dense(self.emb_atom, use_bias=False, dtype=dt, name="atom_proj")(agg))
        x = h + x_e
        x = res_stack(x, self.num_atom_layers, self.emb_atom, "atom_res", dt)
        # force branch: per-edge scalar
        f = res_stack(m, 2, self.emb_edge, "force_res", dt)
        f_scalar = nn.Dense(1, use_bias=False, name="force_out")(
            f.astype(jnp.float32)
        )[..., 0]  # [B,A,K]
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
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # per-atom energy standardization (reference AddOffsets analog)
    energy_mean: float = 0.0
    energy_std: float = 1.0

    derivative_forces = False  # direct forces (config direct_forces: true)

    def _rbf(self, d):
        env = radial.polynomial_envelope(d / self.cutoff, self.envelope_exponent)
        return radial.gaussian_rbf(d, self.num_radial, self.cutoff) * env[..., None]

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        a_dim = batch.z.shape[1]
        cdt = jnp.dtype(self.compute_dtype)
        # in the shipped config all four cutoffs coincide at 12 Å
        # (gemnet-oc.yaml:32-35), so the qint/aeaint graphs are prefixes of
        # the main strict-top-k neighbor list (top_k sorts by distance) —
        # one neighbor list serves all interaction graphs.
        dg = graph.dense_graph(batch.pos, batch.node_mask, self.cutoff_aint)
        nl = graph.neighbor_list(
            batch.pos, batch.node_mask, self.cutoff, self.max_neighbors,
            dense=dg if self.cutoff == self.cutoff_aint else None,
        )

        rbf = jnp.where(nl.mask[..., None], self._rbf(nl.dist), 0.0).astype(cdt)
        rbf_dense = jnp.where(
            dg.adj[..., None], self._rbf(jnp.where(dg.adj, dg.dist, 0.0)), 0.0
        ).astype(cdt)

        # circular basis for triplets k→j→i. Production path: factorized
        # pair features (see TripletInteraction docstring); explicit
        # [B,A,K,M,S] lattice only while fitting ScaleFactors.
        sq, rc = self.num_spherical, self.emb_size_cbf
        if self.is_mutable_collection("scale_stats"):
            cos_t, trip_mask = graph.triplet_angles(nl)
            leg_t = legendre_polynomials(cos_t, sq - 1)
            d_kj = graph.gather_nodes(nl.dist, nl.idx)
            rad_t = jnp.where(trip_mask[..., None], self._rbf(d_kj)[..., :rc], 0.0)
            cbf = jnp.einsum("bikms,bikmr->bikmsr", leg_t, rad_t)
            cbf = _scale(self, "scale_cbf_basis", cbf.reshape(*cbf.shape[:-2], -1))
            trip = {"cbf": cbf.astype(cdt), "trip_mask": trip_mask}
        else:
            # P_s(û_a·û_b) = (4π/(2s+1))·Σ_μ Y_sμ(û_a)·Y_sμ(û_b) for
            # orthonormal real harmonics; the i-side unit is û_ji = −û_ij,
            # so the dense factor carries the (−1)^s parity as well.
            c_full = np.concatenate(
                [
                    np.full(2 * l + 1, ((-1.0) ** l) * 4.0 * np.pi / (2 * l + 1))
                    for l in range(sq)
                ]
            ).astype(np.float32)
            y_e = so3.real_sph_harm(nl.unit, sq - 1, normalized=True)
            y_e = jnp.where(nl.mask[..., None], y_e, 0.0).astype(cdt)
            rad_e = jnp.where(
                nl.mask[..., None], self._rbf(nl.dist)[..., :rc], 0.0
            ).astype(cdt)
            unit_d = jnp.where(
                dg.adj[..., None],
                dg.diff / jnp.maximum(dg.dist, 1e-9)[..., None], 0.0,
            )
            y_d = so3.real_sph_harm(unit_d, sq - 1, normalized=True)
            yc_d = (
                jnp.where(dg.adj[..., None], y_d, 0.0) * jnp.asarray(c_full)
            ).astype(cdt)
            # reverse-edge map for the k == i back-triplet correction
            k_ax = nl.idx.shape[2]
            idx_g = graph.gather_nodes(nl.idx, nl.idx)  # [B,A,K,K]
            mask_g = graph.gather_nodes(nl.mask, nl.idx)
            eq = (
                (idx_g == jnp.arange(a_dim)[None, :, None, None])
                & mask_g & nl.mask[..., None]
            )
            s_basis = self.variable(
                "scales", "scale_cbf_basis", lambda: jnp.ones((), jnp.float32)
            ).value
            trip = {
                "y_e": y_e, "rad_e": rad_e, "yc_d": yc_d,
                "rev_valid": eq.any(-1),
                "rev_flat": nl.idx * k_ax + jnp.argmax(eq, axis=-1).astype(jnp.int32),
                "s_basis": s_basis,
            }

        # quadruplet geometry: the reference c–a–b–d star around each main
        # edge (j→i): c ∈ N(i), d ∈ N(j) (gemnet_oc.py:597-663)
        quad = None
        if self.quad_interaction:
            kq = self.max_neighbors_qint
            u_ic = nl.unit[:, :, :kq]  # [B,A,C,3]  i→c
            idx_c = nl.idx[:, :, :kq]
            mask_c = nl.mask[:, :, :kq]
            u_jd = graph.gather_nodes(nl.unit[:, :, :kq], nl.idx)  # [B,A,K,D,3] j→d
            idx_d = graph.gather_nodes(nl.idx[:, :, :kq], nl.idx)
            mask_d = graph.gather_nodes(nl.mask[:, :, :kq], nl.idx) & nl.mask[..., None]
            # cosφ_cab: angle (c→a) vs (b→a) at a=i; both signs cancel
            cos_cab = jnp.clip(
                jnp.einsum("bicx,bikx->bikc", u_ic, nl.unit), -1, 1
            )
            # cosφ_abd: angle (a→b) vs (b→d) at b=j
            cos_abd = jnp.clip(
                jnp.einsum("bikx,bikdx->bikd", nl.unit, u_jd), -1, 1
            )
            # dihedral between planes (c,a,b) and (a,b,d):
            # n1 = V_ca × V_ba = u_ic × u_ij ; n2 = V_db × V_ba = u_jd × u_ij
            u_ij = nl.unit  # i→j (note V_ba = j→i = -u_ij; sign cancels in both)
            n1 = jnp.cross(
                jnp.broadcast_to(u_ic[:, :, None], (*nl.idx.shape, kq, 3)),
                u_ij[:, :, :, None, :],
            )  # [B,A,K,C,3]
            n2 = jnp.cross(u_jd, u_ij[:, :, :, None, :])  # [B,A,K,D,3]
            n1n = jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-9)
            n2n = jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-9)
            cos_dih = jnp.clip(
                jnp.einsum("bikcx,bikdx->bikcd", n1 / n1n, n2 / n2n), -1, 1
            )
            # exclusions: c ≠ j (degenerate plane), d ≠ i (back edge)
            idx_j = nl.idx
            i_ids = jnp.arange(a_dim)[None, :, None, None]
            quad_mask = (
                nl.mask[:, :, :, None, None]
                & mask_c[:, :, None, :, None]
                & (idx_c[:, :, None, :, None] != idx_j[..., None, None])
                & mask_d[:, :, :, None, :]
                & (idx_d[:, :, :, None, :] != i_ids[..., None])
            )
            quad = (cos_cab, cos_abd, cos_dih, mask_d, quad_mask)

        h = nn.Embed(self.num_elements, self.emb_size_atom, dtype=cdt, name="atom_emb")(batch.z)
        h_j = graph.gather_nodes(h, nl.idx)
        h_i = jnp.broadcast_to(h[:, :, None], h_j.shape)
        m = jax.nn.silu(
            nn.Dense(self.emb_size_edge, dtype=cdt, name="edge_emb")(
                jnp.concatenate([h_i, h_j, rbf], axis=-1)
            )
        )

        e_out = jnp.zeros((*batch.z.shape, self.emb_size_atom), cdt)
        f_out = jnp.zeros(nl.mask.shape)
        x0, f0 = OutputBlock(
            self.emb_size_atom, self.emb_size_edge, self.num_atom, dtype=cdt, name="out_0"
        )(h, m, nl, rbf)
        e_out, f_out = e_out + x0, f_out + f0

        for b in range(self.num_blocks):
            m_new = TripletInteraction(
                self.emb_size_edge, self.emb_size_trip_in, self.emb_size_trip_out,
                self.emb_size_cbf, self.num_spherical, dtype=cdt, name=f"trip_{b}",
            )(m, nl, trip)
            contributions = [m_new]
            if self.quad_interaction:
                contributions.append(
                    QuadrupletInteraction(
                        self.emb_size_edge, self.emb_size_quad_in,
                        self.emb_size_quad_out, self.num_spherical_quad,
                        dtype=cdt, name=f"quad_{b}",
                    )(m, nl, rbf, quad)
                )
            if self.atom_edge_interaction:
                contributions.append(
                    AtomEdgeInteraction(
                        self.emb_size_edge, self.emb_size_rbf, dtype=cdt, name=f"ae_{b}"
                    )(h, m, nl, rbf)
                )
            m = (m + sum(contributions)) * (len(contributions) + 1) ** -0.5
            m = res_stack(m, self.num_before_skip, self.emb_size_edge, f"before_{b}", cdt)
            m = res_stack(m, self.num_after_skip, self.emb_size_edge, f"after_{b}", cdt)

            atom_contrib = []
            if self.edge_atom_interaction:
                atom_contrib.append(
                    EdgeAtomInteraction(self.emb_size_atom, dtype=cdt, name=f"ea_{b}")(
                        m, nl, rbf
                    )
                )
            if self.atom_interaction:
                atom_contrib.append(
                    AtomInteraction(self.emb_size_atom, dtype=cdt, name=f"aa_{b}")(
                        h, dg.adj, rbf_dense
                    )
                )
            if atom_contrib:
                h = (h + sum(atom_contrib)) * (len(atom_contrib) + 1) ** -0.5

            x_b, f_b = OutputBlock(
                self.emb_size_atom, self.emb_size_edge, self.num_atom,
                dtype=cdt, name=f"out_{b + 1}"
            )(h, m, nl, rbf)
            e_out, f_out = e_out + x_b, f_out + f_b

        # energy head: global MLP over summed atom contributions (extensive)
        e = e_out.astype(jnp.float32)
        for i in range(self.num_global_out_layers):
            e = jax.nn.silu(nn.Dense(self.emb_size_atom, use_bias=False, name=f"out_e_{i}")(e))
        e_atom = nn.Dense(1, use_bias=False, name="energy_out")(e)[..., 0]
        e_atom = e_atom * self.energy_std + self.energy_mean
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
