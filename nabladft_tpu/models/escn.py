"""eSCN: equivariant message passing via SO(3)→SO(2) reduction.

TPU-native rebuild of the reference nablaDFT/escn/escn.py (ESCN-OC config:
8 layers, lmax=6, mmax=2, 128 sphere channels, 256 hidden, cutoff 8.0,
Gaussian distance expansion, sphere-sampling energy/force heads with the
0.001 energy scale, escn.py:295-420). Single resolution (the shipped
configs use lmax_list=[6]).

Key mechanic: per edge, node features (spherical-harmonic coefficient
stacks x:[...,(L+1)²,C]) are rotated so the edge aligns with ẑ; in that
frame rotations about the edge act only within (+m,−m) pairs, so the
full SO(3) tensor product collapses to a per-m complex-weighted linear map
(SO2 conv). Rotations come from `ops.so3.wigner_d` computed in-graph — no
Jd.pt lookup tables (reference escn/so3.py:334 loads them from disk).

Everything is laid out on the fixed [B, A, K] edge lattice; per-l blocks
and the m-major regrouping are static Python loops over tiny index sets,
which XLA fuses. Layers are rematted: the per-edge grid activation is the
memory peak, recomputed in backward.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.ops import graph, so3
from nabladft_tpu.ops.radial import gaussian_smearing


# ---------------------------------------------------------------------------
# Host-side constant tables
# ---------------------------------------------------------------------------


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )


@lru_cache(maxsize=None)
def _sh_on_points(l_max: int, n_points: int) -> np.ndarray:
    """Y [P, (L+1)²] at Fibonacci points (component normalization à la
    reference sphharm_weights usage)."""
    pts = _fibonacci_sphere(n_points)
    return so3.real_sph_harm_np(pts, l_max)


@lru_cache(maxsize=None)
def _grid_mats(
    l_max: int, n_points: int, m_max: int | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """(to_grid [P,S], from_grid [S,P]) on a Gauss-Legendre × uniform-φ grid.

    Equiangular-style quadrature like the reference SO3_Grid
    (equiformer_v2/so3.py:462 via e3nn ToS2Grid/FromS2Grid), but with
    Gauss-Legendre latitudes so the analysis integral is *exact* for
    band-limited products: with n_θ ≥ L+1 and n_φ ≥ 2L+1,
    from_grid @ to_grid = I_S to float64 round-off (the round-1
    Fibonacci-pinv variant carried ~1e-3 equivariance error).
    `n_points` is a point budget: n_θ = max(L+1, round(sqrt(n_points/2))),
    n_φ = 2 n_θ - 1, so the models' grid_points_factor knobs keep their
    cost semantics.

    `m_max` (per-edge truncated signals): caps n_φ at 2 m_max + 1 — the
    reference SO3_Grid long_resolution for lmax > mmax (escn/so3.py:441-444).
    Synthesis stays exact (signal has |m| <= m_max); analysis aliases the
    nonlinearity's |m| > m_max products exactly as the reference's grid
    does, at 1/3 the grid-tensor HBM traffic.
    """
    n_theta = max(l_max + 1, int(round((n_points / 2.0) ** 0.5)))
    n_phi = 2 * n_theta - 1
    if m_max is not None and m_max < l_max:
        n_phi = 2 * m_max + 1
    ct, wt = np.polynomial.legendre.leggauss(n_theta)  # nodes in cos θ
    phi = 2 * np.pi * np.arange(n_phi) / n_phi
    st = np.sqrt(1.0 - ct**2)
    pts = np.stack(
        [
            np.outer(st, np.cos(phi)).ravel(),
            np.outer(st, np.sin(phi)).ravel(),
            np.outer(ct, np.ones(n_phi)).ravel(),
        ],
        axis=-1,
    )  # [n_θ·n_φ, 3]
    y = so3.real_sph_harm_np(pts, l_max)  # orthonormal convention
    w = (np.outer(wt, np.ones(n_phi)) * (2 * np.pi / n_phi)).ravel()
    from_grid = (y * w[:, None]).T  # quadrature analysis: ∫ f Y dΩ
    # keep float64: the pallas grid-factorization (escn_layer.
    # _grid_factor_tables) asserts exact rank-1 separability at 1e-9;
    # jnp.asarray at the model use sites downcasts to f32 under default x64.
    return y, from_grid


def _trunc_sizes(l_max: int, m_max: int) -> List[int]:
    return [2 * min(l, m_max) + 1 for l in range(l_max + 1)]


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


def _mmajor_offsets(l_max: int, m_max: int) -> List[Tuple[int, int]]:
    """[(start, n_l)] row spans in the m-major stack: m=0 span, then
    (+m, -m) span pairs for m = 1..M."""
    spans = [(0, l_max + 1)]
    off = l_max + 1
    for m in range(1, m_max + 1):
        n_l = l_max + 1 - m
        spans.append((off, n_l))
        spans.append((off + n_l, n_l))
        off += 2 * n_l
    return spans


class SO2Conv(nn.Module):
    """Complex-weighted per-m linear map (reference escn.py:807-878)."""

    m: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_plus, x_minus, x_edge):
        # x_plus/x_minus: [..., n_l, C] contiguous m-major slices over l >= m
        n_l, c = x_plus.shape[-2], x_plus.shape[-1]
        flat_p = x_plus.reshape(*x_plus.shape[:-2], n_l * c)
        flat_m = x_minus.reshape(*x_minus.shape[:-2], n_l * c)
        dt = self.dtype
        gate = jax.nn.silu(nn.Dense(2 * self.hidden, dtype=dt, name="fc_dist")(x_edge))
        g_r, g_i = jnp.split(gate, 2, axis=-1)
        fc1_r = nn.Dense(self.hidden, use_bias=False, dtype=dt, name="fc1_r")
        fc2_r = nn.Dense(n_l * c, use_bias=False, dtype=dt, name="fc2_r")
        fc1_i = nn.Dense(self.hidden, use_bias=False, dtype=dt, name="fc1_i")
        fc2_i = nn.Dense(n_l * c, use_bias=False, dtype=dt, name="fc2_i")
        # complex multiply: (R + iI)(p + i q) with feature maps
        r_p, r_m = fc2_r(fc1_r(flat_p) * g_r), fc2_r(fc1_r(flat_m) * g_r)
        i_p, i_m = fc2_i(fc1_i(flat_p) * g_i), fc2_i(fc1_i(flat_m) * g_i)
        out_p = (r_p - i_m).reshape(x_plus.shape)
        out_m = (r_m + i_p).reshape(x_minus.shape)
        return out_p, out_m


class SO2Block(nn.Module):
    """All-m SO(2) convolution on edge-aligned truncated features.

    Operates on the m-major [..., S_t, C] stack (so3.mmajor_rows order):
    every per-m operand is a contiguous row slice and the output is a
    single concatenate back in the same order — no per-l stacking copies
    (the reference's runtime _m_primary reshuffle, escn/so3.py:24-110,
    becomes the storage order)."""

    l_max: int
    m_max: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, x_edge):
        L, M = self.l_max, self.m_max
        c = x_t.shape[-1]
        spans = _mmajor_offsets(L, M)
        # m = 0 path
        s0, n0 = spans[0]
        x0 = x_t[..., s0 : s0 + n0, :]
        flat0 = x0.reshape(*x0.shape[:-2], n0 * c)
        g0 = jax.nn.silu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_dist0")(x_edge))
        h0 = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="fc1_m0")(flat0) * g0
        out0 = nn.Dense(n0 * c, use_bias=False, dtype=self.dtype, name="fc2_m0")(h0)
        parts = [out0.reshape(x0.shape)]
        # m > 0 paths
        for m in range(1, M + 1):
            sp, n_l = spans[2 * m - 1]
            sm, _ = spans[2 * m]
            xp = x_t[..., sp : sp + n_l, :]
            xm = x_t[..., sm : sm + n_l, :]
            op, om = SO2Conv(m, self.hidden, dtype=self.dtype, name=f"so2_m{m}")(xp, xm, x_edge)
            parts += [op, om]
        return jnp.concatenate(parts, axis=-2)


class EdgeBlock(nn.Module):
    """Invariant edge embedding from distance + endpoint elements
    (reference escn.py:880-933)."""

    edge_channels: int
    num_elements: int
    cutoff: float
    num_gaussians: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dist, z_src, z_dst):
        x_dist = gaussian_smearing(dist, self.num_gaussians, 0.0, self.cutoff).astype(self.dtype)
        x_dist = nn.Dense(self.edge_channels, dtype=self.dtype, name="fc_dist")(x_dist)
        init = nn.initializers.uniform(scale=0.002)  # ~U(-.001,.001) parity

        def centered(key, shape, dtype):
            return init(key, shape, dtype) - 0.001

        src = nn.Embed(self.num_elements, self.edge_channels,
                       embedding_init=centered, name="src_embed")(z_src)
        dst = nn.Embed(self.num_elements, self.edge_channels,
                       embedding_init=centered, name="dst_embed")(z_dst)
        x = jax.nn.silu(src.astype(self.dtype) + dst.astype(self.dtype) + x_dist)
        return jax.nn.silu(nn.Dense(self.edge_channels, dtype=self.dtype, name="fc_edge")(x))


class ESCNLayer(nn.Module):
    l_max: int
    m_max: int
    sphere_channels: int
    hidden: int
    edge_channels: int
    num_elements: int
    cutoff: float
    num_gaussians: int
    grid_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nl: graph.NeighborList, d_t, batch):
        """x: [B,A,S,C]; d_t: [B,A,K,S_t,S] m-major truncated block-diag
        Wigner (so3.wigner_trunc_mmajor) — one batched matmul rotates +
        truncates, its transpose-contraction rotates back."""
        L, M, C = self.l_max, self.m_max, self.sphere_channels
        z = batch.z
        z_src = graph.gather_nodes(z[..., None], nl.idx)[..., 0]  # neighbor j
        x_edge = EdgeBlock(
            self.edge_channels, self.num_elements, self.cutoff,
            self.num_gaussians, dtype=self.dtype, name="edge_block",
        )(nl.dist, z_src, jnp.broadcast_to(z[:, :, None], z_src.shape))

        # gather + rotate + truncate: one batched matmul per stream
        x_src = jnp.einsum("bakmn,baknc->bakmc", d_t, graph.gather_nodes(x, nl.idx))
        # target stream never materializes the broadcast [B,A,K,S,C] copy
        x_tgt = jnp.einsum("bakmn,banc->bakmc", d_t, x)

        msg_src = SO2Block(L, M, self.hidden, dtype=self.dtype, name="so2_source")(x_src, x_edge)
        msg_tgt = SO2Block(L, M, self.hidden, dtype=self.dtype, name="so2_target")(x_tgt, x_edge)
        msg = msg_src + msg_tgt  # [B,A,K,S_t,C] m-major

        # point-wise nonlinearity on the truncated sphere grid at the
        # reference's resolution (n_φ = 2M+1, escn/so3.py:441-444)
        to_g, from_g = _grid_mats(L, self.grid_points, M)
        cols = so3.mmajor_cols(L, M)
        to_gt = jnp.asarray(to_g[:, cols], x.dtype)
        from_gt = jnp.asarray(from_g[cols], x.dtype)
        grid = jax.nn.silu(jnp.einsum("ps,baksc->bakpc", to_gt, msg))
        msg = jnp.einsum("sp,bakpc->baksc", from_gt, grid)

        # rotate back (inverse = transpose), un-truncate, aggregate
        full = jnp.einsum("bakmn,bakmc->baknc", d_t, msg)  # [B,A,K,S,C]
        full = jnp.where(nl.mask[..., None, None], full, 0.0)
        x_message = full.sum(axis=2)  # [B,A,S,C]

        # aggregated point-wise sphere MLP on [x, x_message] — FULL grid
        # resolution (node features carry every m up to L; the truncated
        # n_phi = 2M+1 grid above is only valid for the per-edge stream)
        to_gf, from_gf = _grid_mats(L, self.grid_points)
        return _sphere_mlp_tail(x, x_message, to_gf, from_gf, C, self.dtype)


def _sphere_mlp_tail(x, x_message, to_g, from_g, c, dtype):
    """Node-level full-grid MLP on [x, x_message] (escn.py:573-585).
    Must run inside a compact module scope (creates Dense submodules)."""
    to_gf = jnp.asarray(to_g, x.dtype)
    from_gf = jnp.asarray(from_g, x.dtype)
    g_m = jnp.einsum("ps,basc->bapc", to_gf, x_message)
    g_x = jnp.einsum("ps,basc->bapc", to_gf, x)
    g = jnp.concatenate([g_x, g_m], axis=-1)
    g = jax.nn.silu(nn.Dense(c, use_bias=False, dtype=dtype, name="fc1_sphere")(g))
    g = jax.nn.silu(nn.Dense(c, use_bias=False, dtype=dtype, name="fc2_sphere")(g))
    g = nn.Dense(c, use_bias=False, dtype=dtype, name="fc3_sphere")(g)
    return jnp.einsum("sp,bapc->basc", from_gf, g)


class PallasESCNLayer(nn.Module):
    """eSCN layer whose per-edge message pipeline runs as ONE fused Pallas
    kernel (ops/pallas/escn_layer.escn_message): rotations, both SO(2)
    blocks (gates computed in-kernel), the truncated-grid activation, and
    the neighbor reduction never leave VMEM. The node-level sphere MLP
    stays in XLA. Math parity with ESCNLayer is pinned by
    tests/ops/test_escn_layer.py."""

    l_max: int
    m_max: int
    sphere_channels: int
    hidden: int
    edge_channels: int
    num_elements: int
    cutoff: float
    num_gaussians: int
    grid_points: int
    interpret: bool = False
    # run the kernel's MXU matmuls in bf16 (fp32 accumulate) — the model's
    # compute_dtype="bfloat16" analog for the fused path
    mxu_bf16: bool = False

    @nn.compact
    def __call__(self, x, dcomp, dist_d, z_src_d, z_dst_d):
        """x [B,A,S,C] fp32; dcomp [B,A,A,K] masked compact Wigner;
        dist_d [B,A,A]; z_*_d [B,A,A] endpoint elements."""
        from nabladft_tpu.ops.pallas import escn_layer as ek

        L, M, C, H = self.l_max, self.m_max, self.sphere_channels, self.hidden
        x_edge = EdgeBlock(
            self.edge_channels, self.num_elements, self.cutoff,
            self.num_gaussians, name="edge_block",
        )(dist_d, z_src_d, z_dst_d)

        ec = self.edge_channels
        g_tot = (2 * M + 1) * H
        lecun = nn.initializers.lecun_normal()
        wg = self.param("wg", lecun, (2, ec, g_tot))
        bg = self.param("bg", nn.initializers.zeros, (2, 1, g_tot))
        n0 = L + 1
        w1_0 = self.param("w1_0", lecun, (2, n0 * C, H))
        w2_0 = self.param("w2_0", lecun, (2, H, n0 * C))
        fc1_m, w2r_m, w2i_m = [], [], []
        for m in range(1, M + 1):
            n_l = L + 1 - m
            fc1_m.append(self.param(f"fc1_m{m}", lecun, (2, n_l * C, 2 * H)))
            w2r_m.append(self.param(f"w2r_m{m}", lecun, (2, H, n_l * C)))
            w2i_m.append(self.param(f"w2i_m{m}", lecun, (2, H, n_l * C)))

        x32 = x.astype(jnp.float32)
        x_sm = jnp.swapaxes(x32, 1, 2)  # [B,S,A,C]
        x_message = ek.escn_message(
            L, M, self.grid_points, self.interpret, self.mxu_bf16,
            x_sm, x32, dcomp, x_edge,
            wg, bg, w1_0, w2_0, fc1_m, w2r_m, w2i_m,
        )  # [B,A,S,C]

        to_g, from_g = _grid_mats(L, self.grid_points)
        return _sphere_mlp_tail(x, x_message, to_g, from_g, C, jnp.float32)


@register_model("escn")
class ESCN(nn.Module):
    """Defaults follow reference config/model/escn-oc.yaml."""

    num_layers: int = 8
    l_max: int = 6
    m_max: int = 2
    sphere_channels: int = 128
    hidden: int = 256
    edge_channels: int = 128
    cutoff: float = 8.0
    max_neighbors: int = 40
    num_elements: int = 65
    num_sphere_samples: int = 128
    distance_resolution: float = 0.02
    grid_points_factor: int = 2
    remat: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # per-atom energy standardization (reference AddOffsets analog)
    energy_mean: float = 0.0
    energy_std: float = 1.0
    # fused Pallas message-layer kernel (ops/pallas/escn_layer): the XLA
    # formulation is bandwidth-bound (<10% MFU) on its [E,·,C] HBM
    # intermediates. "auto" = on for TPU, XLA path on CPU (interpret-mode
    # compile of the unrolled kernel is far too slow for CPU test runs;
    # parity is pinned by tests/ops/test_escn_layer.py). NOTE: the two
    # paths use different parameter layouts — checkpoints are per-path.
    use_pallas: Union[bool, str] = "auto"

    derivative_forces = False  # sphere-sampled direct force head

    def _pallas_enabled(self) -> bool:
        if self.use_pallas == "auto":
            return jax.default_backend() != "cpu"
        return bool(self.use_pallas)

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        L, C = self.l_max, self.sphere_channels
        S = (L + 1) ** 2
        a_dim = batch.z.shape[1]
        nl = graph.neighbor_list(batch.pos, batch.node_mask, self.cutoff, self.max_neighbors)

        cdt = jnp.dtype(self.compute_dtype)
        pallas_on = self._pallas_enabled()
        rot = so3.rot_to_z(graph.edge_rotation_vectors(nl.unit, nl.mask))
        if pallas_on:
            # dense-pair lattice for the fused kernel, scattered from the
            # SAME top-K neighbor list so both paths see identical graphs
            mask_d, unit_d, dist_d = graph.dense_from_neighbor_list(nl, a_dim)
            rot_d = so3.rot_to_z(unit_d)
            dcomp = so3.wigner_trunc_compact_from_rot(rot_d, L, self.m_max)
            dcomp = dcomp * mask_d[..., None]
            z_src_d = jnp.broadcast_to(batch.z[:, None, :], (dcomp.shape[:3]))
            z_dst_d = jnp.broadcast_to(batch.z[:, :, None], (dcomp.shape[:3]))
        else:
            # per-edge Wigner rotations, assembled ONCE into the m-major
            # truncated block-diagonal [S_t, S] form — the per-l small
            # blocks (whose (8,128)-tile padding wastes up to 25x HBM)
            # never survive into the layer loop
            d_t = so3.wigner_trunc_mmajor_from_rot(rot, L, self.m_max)
            d_t = d_t.astype(cdt)

        # node features: l=0 component = atom embedding
        emb = nn.Embed(self.num_elements, C, dtype=cdt, name="sphere_embedding")(batch.z)
        x = jnp.zeros((*batch.z.shape, S, C), emb.dtype)
        x = x.at[..., 0, :].set(emb)

        num_gauss = int(round(self.cutoff / self.distance_resolution))
        if pallas_on:
            interp = jax.default_backend() == "cpu"
            x = x.astype(jnp.float32)
            for i in range(self.num_layers):
                out = PallasESCNLayer(
                    L, self.m_max, C, self.hidden, self.edge_channels,
                    self.num_elements, self.cutoff, num_gauss,
                    self.grid_points_factor * S, interpret=interp,
                    mxu_bf16=(cdt == jnp.bfloat16),
                    name=f"layer_{i}",
                )(x, dcomp, dist_d, z_src_d, z_dst_d)
                x = out if i == 0 else x + out
        else:
            layer_cls = nn.remat(ESCNLayer) if self.remat else ESCNLayer
            for i in range(self.num_layers):
                out = layer_cls(
                    L, self.m_max, C, self.hidden, self.edge_channels,
                    self.num_elements, self.cutoff, num_gauss,
                    self.grid_points_factor * S, dtype=cdt, name=f"layer_{i}",
                )(x, nl, d_t, batch)
                x = out if i == 0 else x + out

        # sphere-sampled heads (reference escn.py:935-1005)
        pts = _fibonacci_sphere(self.num_sphere_samples)
        x = x.astype(jnp.float32)
        y_pts = jnp.asarray(
            _sh_on_points(L, self.num_sphere_samples), x.dtype
        )  # [P,S]
        x_pt = jnp.einsum("ps,basc->bapc", y_pts, x)  # [B,A,P,C]

        h = jax.nn.silu(nn.Dense(C, name="energy_fc1")(x_pt))
        h = jax.nn.silu(nn.Dense(C, name="energy_fc2")(h))
        h = nn.Dense(1, use_bias=False, name="energy_fc3")(h)[..., 0]  # [B,A,P]
        node_energy = h.mean(axis=-1) * 0.001  # reference energy scale
        node_energy = node_energy * self.energy_std + self.energy_mean
        energy = jnp.sum(jnp.where(batch.node_mask, node_energy, 0.0), axis=1)

        f = jax.nn.silu(nn.Dense(C, name="force_fc1")(x_pt))
        f = jax.nn.silu(nn.Dense(C, name="force_fc2")(f))
        f = nn.Dense(1, use_bias=False, name="force_fc3")(f)[..., 0]  # [B,A,P]
        forces = jnp.einsum("bap,pc->bac", f, jnp.asarray(pts, x.dtype))
        forces = forces / self.num_sphere_samples
        forces = forces * batch.node_mask[..., None]
        return {"energy": energy, "forces": forces}
