"""EquiformerV2: SO(2)-reduced equivariant graph attention transformer.

TPU-native rebuild of reference nablaDFT/equiformer_v2 (EquiformerV2_OC20,
equiformer_v2_oc20.py:46; config equiformer_v2_oc20.yaml: 12 layers, 128
sphere channels, 8 heads × 16 value channels, 64 alpha channels, lmax=6,
mmax=2, r=12 Å, K=30, gaussian distance basis, separable S2 activation,
grid-MLP FFN, 'layer_norm_sh' norms).

Shares the edge-alignment machinery with eSCN (`ops.so3` Wigner rotations,
pseudo-inverse sphere grids from models/escn.py). Per block:
  pre-norm → SO(2) graph attention (concat source/target features,
  per-(l,channel) radial scaling, rotate, SO2 conv → separable-S2
  activation + invariant alpha scalars → SO2 conv → masked softmax over the
  K neighbor axis → rotate back, aggregate, project) → residual →
  pre-norm → grid-MLP FFN → residual.
Heads: scalar energy FFN; direct forces from a 1-channel attention block's
l=1 output (reference equiformer_v2_oc20.py force_block), exactly
equivariant. alpha/drop-path dropout via the `deterministic` flag.
"""

from __future__ import annotations

from typing import Union



import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import ModelOutput, register_model
from nabladft_tpu.models.escn import _grid_mats, _mmajor_offsets
from nabladft_tpu.ops import graph, so3
from nabladft_tpu.ops.radial import gaussian_smearing


class EquivariantLayerNorm(nn.Module):
    """'layer_norm_sh': LN on l=0 channels; per-l RMS norm with learned
    per-(l, channel) scale for l>0 (reference equiformer_v2/layer_norm.py)."""

    l_max: int

    @nn.compact
    def __call__(self, x):  # x: [B,A,S,C]
        c = x.shape[-1]
        outs = []
        x0 = x[..., 0, :]
        x0 = nn.LayerNorm(name="ln0")(x0)
        outs.append(x0[..., None, :])
        for l in range(1, self.l_max + 1):
            sl = x[..., l * l : (l + 1) * (l + 1), :]
            rms = jnp.sqrt(jnp.mean(jnp.sum(sl * sl, axis=-2), axis=-1, keepdims=True) + 1e-8)
            g = self.param(f"gain_{l}", nn.initializers.ones, (c,))
            outs.append(sl / rms[..., None, :] * g)
        return jnp.concatenate(outs, axis=-2)


class RadialFn(nn.Module):
    """Reference RadialFunction (equiformer_v2/radial_function.py): Dense →
    LayerNorm → SiLU stacks, plain Dense last. `channels` excludes the input
    size (torch channels_list[1:])."""

    channels: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, dtype=self.dtype, name=f"lin_{i}")(x)
            if i < n - 1:
                # torch.nn.LayerNorm default eps (reference parity)
                x = jax.nn.silu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             name=f"ln_{i}")(x))
        return x


class SO2ConvEq(nn.Module):
    """SO(2) convolution on edge-aligned truncated features with optional
    extra invariant (m=0) outputs (reference equiformer_v2/so2_ops.py).

    `rad_channels` (the reference's internal_weights=False path,
    so2_ops.py:134-188): hidden sizes of an internal RadialFunction whose
    output scales each m-block's input elementwise per (l, channel) —
    the per-m radial modulation of the published use_m_share_rad=False
    checkpoints. `m0_bias` mirrors the reference fc_m0 bias (Linear default
    True there; our m-share variant predates it and stays bias-free)."""

    l_max: int
    m_max: int
    out_channels: int
    extra_m0_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    m0_bias: bool = False
    rad_channels: tuple = ()

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, x_edge=None):
        # x_t: [..., S_t, Cin] m-major stack (so3.mmajor_rows order) — every
        # per-m operand is a contiguous row slice, no stacking copies
        L, M, co = self.l_max, self.m_max, self.out_channels
        cin = x_t.shape[-1]
        spans = _mmajor_offsets(L, M)
        rad = None
        if self.rad_channels:
            n_rad = sum((L + 1 - m) * cin for m in range(0, M + 1))
            rad = RadialFn(tuple(self.rad_channels) + (n_rad,),
                           dtype=self.dtype, name="rad_func")(
                x_edge.astype(self.dtype))
        s0, n0 = spans[0]
        x0 = x_t[..., s0 : s0 + n0, :]
        flat0 = x0.reshape(*x0.shape[:-2], -1)
        off_rad = (L + 1) * cin
        if rad is not None:
            flat0 = flat0 * rad[..., :off_rad]
        h0 = nn.Dense((L + 1) * co + self.extra_m0_channels,
                      use_bias=self.m0_bias,
                      dtype=self.dtype, name="fc_m0")(flat0)
        extra = h0[..., (L + 1) * co :]
        out0 = h0[..., : (L + 1) * co].reshape(*x0.shape[:-2], L + 1, co)
        parts = [out0]
        for m in range(1, M + 1):
            sp, n_l = spans[2 * m - 1]
            sm, _ = spans[2 * m]
            xp = x_t[..., sp : sp + n_l, :]
            xm = x_t[..., sm : sm + n_l, :]
            fp = xp.reshape(*xp.shape[:-2], -1)
            fm = xm.reshape(*xm.shape[:-2], -1)
            if rad is not None:
                rad_m = rad[..., off_rad : off_rad + n_l * cin]
                fp = fp * rad_m
                fm = fm * rad_m
                off_rad += n_l * cin
            wr = nn.Dense(n_l * co, use_bias=False, dtype=self.dtype, name=f"fc_r_m{m}")
            wi = nn.Dense(n_l * co, use_bias=False, dtype=self.dtype, name=f"fc_i_m{m}")
            op = (wr(fp) - wi(fm)).reshape(*xp.shape[:-2], n_l, co)
            om = (wr(fm) + wi(fp)).reshape(*xm.shape[:-2], n_l, co)
            parts += [op, om]
        return jnp.concatenate(parts, axis=-2), extra


class GridFFN(nn.Module):
    """Grid-projected pointwise MLP FFN (use_grid_mlp=True path)."""

    l_max: int
    hidden: int
    out_channels: int
    grid_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,A,S,C]
        to_g, from_g = _grid_mats(self.l_max, self.grid_points)
        to_g = jnp.asarray(to_g, x.dtype)
        from_g = jnp.asarray(from_g, x.dtype)
        g = jnp.einsum("ps,basc->bapc", to_g, x.astype(self.dtype))
        g = jax.nn.silu(nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)(g))
        g = jax.nn.silu(nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)(g))
        g = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(g)
        return jnp.einsum("sp,bapc->basc", from_g, g)


class RefEquivariantLayerNorm(nn.Module):
    """Exact 'layer_norm_sh' (reference layer_norm.py:117-215,
    EquivariantLayerNormArraySphericalHarmonics with component normalization
    and std_balance_degrees=True): LayerNorm on l=0; ONE shared rescale for
    all l>0 rows from the degree-balanced second moment (each l weighted
    1/(2l+1)/L), with a per-(l, channel) affine weight."""

    l_max: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [B,A,S,C]
        c = x.shape[-1]
        x0 = nn.LayerNorm(epsilon=self.eps, name="ln0")(x[..., 0, :])
        rest = x[..., 1:, :]
        w = np.concatenate([
            np.full(2 * l + 1, 1.0 / ((2 * l + 1) * self.l_max))
            for l in range(1, self.l_max + 1)
        ]).astype(np.float32)
        fn = jnp.einsum("...ic,i->...c", rest * rest, jnp.asarray(w, x.dtype))
        fn = jnp.mean(fn, axis=-1)  # [B,A]
        inv = jax.lax.rsqrt(fn + self.eps)
        g = self.param("affine_weight", nn.initializers.ones, (self.l_max, c))
        outs = [x0[..., None, :]]
        for l in range(1, self.l_max + 1):
            sl = x[..., l * l : (l + 1) * (l + 1), :]
            outs.append(sl * inv[..., None, None] * g[l - 1].astype(x.dtype))
        return jnp.concatenate(outs, axis=-2)


class SO3LinearV2(nn.Module):
    """Per-l linear map with one stacked weight and an l=0 bias (reference
    so3.py:603-641)."""

    l_max: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [..., S, Cin]
        cin = x.shape[-1]
        bound = 1.0 / np.sqrt(cin)
        w = self.param(
            "weight",
            lambda key: jax.random.uniform(
                key, (self.l_max + 1, cin, self.out_channels),
                minval=-bound, maxval=bound),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        l_of_row = np.concatenate([
            np.full(2 * l + 1, l) for l in range(self.l_max + 1)
        ]).astype(np.int32)
        wrow = jnp.take(w.astype(self.dtype), jnp.asarray(l_of_row), axis=0)
        out = jnp.einsum("...sc,sco->...so", x, wrow)
        out0 = out[..., 0, :] + b.astype(self.dtype)
        return jnp.concatenate([out0[..., None, :], out[..., 1:, :]], axis=-2)


class RefFFN(nn.Module):
    """Reference FeedForwardNetwork with use_grid_mlp + separable S2
    (transformer_block.py:328-455): scalar MLP on the l=0 input,
    SO3_LinearV2 in, 3-Dense pointwise grid MLP, l=0 row replaced by the
    scalar branch, SO3_LinearV2 out."""

    l_max: int
    hidden: int
    out_channels: int
    grid_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B,A,S,C]
        scal = jax.nn.silu(
            nn.Dense(self.hidden, dtype=self.dtype, name="scalar_mlp")(x[..., 0, :])
        )
        h = SO3LinearV2(self.l_max, self.hidden, dtype=self.dtype,
                        name="so3_linear_1")(x)
        to_g, from_g = _grid_mats(self.l_max, self.grid_points)
        g = jnp.einsum("ps,basc->bapc", jnp.asarray(to_g, h.dtype), h)
        g = jax.nn.silu(nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                                 name="grid_0")(g))
        g = jax.nn.silu(nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                                 name="grid_1")(g))
        g = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="grid_2")(g)
        h = jnp.einsum("sp,bapc->basc", jnp.asarray(from_g, g.dtype), g)
        h = jnp.concatenate([scal[..., None, :], h[..., 1:, :]], axis=-2)
        return SO3LinearV2(self.l_max, self.out_channels, dtype=self.dtype,
                           name="so3_linear_2")(h)


def _smooth_leaky_relu(x, alpha: float = 0.2):
    """Reference SmoothLeakyReLU (activation.py:58-66)."""
    return (1 + alpha) / 2 * x + (1 - alpha) / 2 * x * (2 * jax.nn.sigmoid(x) - 1)


class SO2GraphAttention(nn.Module):
    """The message/attention core (reference transformer_block.py:22-326)."""

    l_max: int
    m_max: int
    sphere_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    out_channels: int
    edge_channels: int
    grid_points: int
    deterministic: bool = True
    alpha_drop: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # reference-compatible variant (published checkpoints,
    # use_m_share_rad=False): per-m internal RadialFunction in so2_conv_1,
    # per-block source/target atom embeddings, fc_m0 biases, hidden width
    # attn_hidden_channels, SmoothLeakyReLU alpha activation, SO3_LinearV2
    # output projection semantics (all per transformer_block.py:22-326)
    m_share_rad: bool = True
    hidden_channels: int = 0  # 0 -> num_heads * attn_value_channels
    atom_edge_embed: bool = False
    num_elements: int = 65
    alpha_act: str = "silu"  # "smooth_leaky" for the reference variant
    rad_hidden: tuple = ()

    @nn.compact
    def __call__(self, x, nl: graph.NeighborList, d_t, x_edge,
                 z_src=None, z_dst=None):
        """d_t: [B,A,K,S_t,S] m-major truncated block-diagonal Wigner
        (so3.wigner_trunc_mmajor)."""
        x = x.astype(self.dtype)
        L, M = self.l_max, self.m_max
        h, va, vc = self.num_heads, self.attn_alpha_channels, self.attn_value_channels
        hid = self.hidden_channels or h * vc

        if self.atom_edge_embed:
            # per-block source/target embeddings appended to the raw edge
            # scalars (transformer_block.py:107-115, init uniform ±0.001)
            u_init = nn.initializers.uniform(scale=0.002)
            se = nn.Embed(self.num_elements, self.edge_channels,
                          embedding_init=lambda k, s, d=jnp.float32:
                          u_init(k, s, d) - 0.001,
                          name="source_embedding")(z_src)
            te = nn.Embed(self.num_elements, self.edge_channels,
                          embedding_init=lambda k, s, d=jnp.float32:
                          u_init(k, s, d) - 0.001,
                          name="target_embedding")(z_dst)
            x_edge = jnp.concatenate(
                [x_edge, se.astype(x_edge.dtype), te.astype(x_edge.dtype)],
                axis=-1)

        # rotate + truncate each stream with one batched matmul, THEN concat
        # channel-wise in the (5.4x smaller) truncated space; the target
        # stream contracts node features directly (no broadcast copy)
        x_src = jnp.einsum("bakmn,baknc->bakmc", d_t, graph.gather_nodes(x, nl.idx))
        x_tgt = jnp.einsum("bakmn,banc->bakmc", d_t, x)
        msg = jnp.concatenate([x_src, x_tgt], axis=-1)  # [B,A,K,S_t,2C]
        c2 = msg.shape[-1]

        if self.m_share_rad:
            # per-(l,channel) radial scaling shared over m (use_m_share_rad).
            # It is uniform over m within each l, so it commutes with the
            # edge rotation — applied post-rotation on the truncated rows.
            rad = nn.Dense((L + 1) * c2, dtype=self.dtype, name="rad_func")(x_edge.astype(self.dtype))
            rad = rad.reshape(*rad.shape[:-1], L + 1, c2)
            l_of_row = jnp.asarray([l for l, _ in so3.mmajor_rows(L, M)])
            msg = msg * jnp.take(rad, l_of_row, axis=-2)

        hidden, extra = SO2ConvEq(
            L, M, hid, extra_m0_channels=h * va + hid, dtype=self.dtype,
            m0_bias=not self.m_share_rad,
            rad_channels=() if self.m_share_rad else tuple(self.rad_hidden),
            name="so2_conv_1"
        )(msg, x_edge)
        alpha_scal = extra[..., : h * va]
        gate_scal = extra[..., h * va :]

        # separable S2 activation on the truncated rows at the reference
        # resolution (n_phi = 2M+1); gates get a plain silu
        to_g, from_g = _grid_mats(L, self.grid_points, M)
        cols = so3.mmajor_cols(L, M)
        to_gt = jnp.asarray(to_g[:, cols], x.dtype)
        from_gt = jnp.asarray(from_g[cols], x.dtype)
        grid = jax.nn.silu(jnp.einsum("ps,baksc->bakpc", to_gt, hidden))
        flat = jnp.einsum("sp,bakpc->baksc", from_gt, grid)
        # separable S2: the invariant (l=0, first m-major row) branch is a
        # plain silu of the dedicated gating scalars instead of the grid
        hidden = jnp.concatenate(
            [jax.nn.silu(gate_scal)[..., None, :], flat[..., 1:, :]], axis=-2
        )

        values, _ = SO2ConvEq(L, M, h * vc, dtype=self.dtype,
                              m0_bias=not self.m_share_rad,
                              name="so2_conv_2")(hidden, x_edge)

        # attention weights from invariant alpha scalars
        a = alpha_scal.reshape(*alpha_scal.shape[:-1], h, va).astype(jnp.float32)
        a = nn.LayerNorm(epsilon=1e-5 if not self.m_share_rad else 1e-6,
                         name="alpha_norm")(a)
        a = _smooth_leaky_relu(a) if self.alpha_act == "smooth_leaky" else jax.nn.silu(a)
        alpha_dot = self.param("alpha_dot", nn.initializers.normal(1.0), (h, va))
        logits = jnp.einsum("bakhv,hv->bakh", a, alpha_dot)
        neg = jnp.asarray(-1e9, logits.dtype)
        logits = jnp.where(nl.mask[..., None], logits, neg)
        alpha = jax.nn.softmax(logits, axis=2)  # softmax over neighbors K
        alpha = jnp.where(nl.mask[..., None], alpha, 0.0).astype(self.dtype)
        alpha = nn.Dropout(self.alpha_drop, deterministic=self.deterministic)(alpha)

        # weight messages (uniform over rows), rotate back, aggregate
        v = values.reshape(*values.shape[:-1], h, vc) * alpha[..., None, :, None]
        v = v.reshape(*values.shape)  # [B,A,K,S_t,h*vc]
        full = jnp.einsum("bakmn,bakmc->baknc", d_t, v)  # [B,A,K,S,h*vc]
        full = jnp.where(nl.mask[..., None, None], full, 0.0)
        agg = full.sum(axis=2)  # [B,A,S,h*vc]
        # project per l to out_channels (SO3_Linear)
        proj = []
        for l in range(L + 1):
            sl = agg[..., l * l : (l + 1) * (l + 1), :]
            proj.append(nn.Dense(self.out_channels, use_bias=(l == 0),
                                 dtype=self.dtype, name=f"proj_l{l}")(sl))
        return jnp.concatenate(proj, axis=-2)


class PallasSO2GraphAttention(nn.Module):
    """SO2GraphAttention whose per-edge pipeline runs as one fused Pallas
    kernel (ops/pallas/eqv2_attn.eqv2_attention_vjp); the per-l output
    projection stays in XLA. Parameter layout differs from the XLA module
    (kernel-packed matrices); parity is pinned by tests/ops/test_eqv2_attn.
    """

    l_max: int
    m_max: int
    sphere_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    out_channels: int
    edge_channels: int
    grid_points: int
    deterministic: bool = True
    alpha_drop: float = 0.1
    interpret: bool = False
    mxu_bf16: bool = False

    @nn.compact
    def __call__(self, x, oh, dcomp, maskf, x_edge):
        from nabladft_tpu.ops.pallas import eqv2_attn as ak

        L, M, C = self.l_max, self.m_max, self.sphere_channels
        nh, va, vc = self.num_heads, self.attn_alpha_channels, self.attn_value_channels
        co = nh * vc
        n0 = L + 1
        ec = x_edge.shape[-1]
        lecun = nn.initializers.lecun_normal()
        w_rad = self.param("w_rad", lecun, (ec, n0 * 2 * C))
        b_rad = self.param("b_rad", nn.initializers.zeros, (1, n0 * 2 * C))
        w1 = self.param("w1", lecun, (n0 * 2 * C, n0 * co + nh * va + co))
        w2 = self.param("w2", lecun, (n0 * co, n0 * co))
        fc1m, fc2m = [], []
        for m in range(1, M + 1):
            n_l = L + 1 - m
            fc1m.append(self.param(f"fc1_m{m}", lecun, (n_l * 2 * C, 2 * n_l * co)))
            fc2m.append(self.param(f"fc2_m{m}", lecun, (n_l * co, 2 * n_l * co)))
        ln_scale = self.param("ln_scale", nn.initializers.ones, (1, va))
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (1, va))
        alpha_dot = self.param(
            "alpha_dot", nn.initializers.normal(1.0), (nh, va)
        )
        alpha_dot_flat = alpha_dot.reshape(1, nh * va)

        b, a = x.shape[0], x.shape[1]
        k_e = maskf.shape[2]
        if not self.deterministic and self.alpha_drop > 0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.alpha_drop,
                (b, a, k_e, nh)
            )
            dropk = keep.astype(jnp.float32) / (1.0 - self.alpha_drop)
        else:
            dropk = jnp.ones((b, a, k_e, nh), jnp.float32)

        x32 = x.astype(jnp.float32)
        x_sm = jnp.swapaxes(x32, 1, 2)
        interp = self.interpret
        agg = ak.eqv2_attention_vjp(
            L, M, self.grid_points, interp, self.mxu_bf16, nh, va,
            x_sm, oh, x32, dcomp, x_edge.astype(jnp.float32),
            maskf[..., None], dropk,
            w_rad, b_rad, w1, fc1m, w2, fc2m,
            jnp.tile(ln_scale, (1, nh)), jnp.tile(ln_bias, (1, nh)),
            alpha_dot_flat,
        )  # [B,A,S,co]
        proj = []
        for l in range(L + 1):
            sl = agg[..., l * l : (l + 1) * (l + 1), :]
            proj.append(nn.Dense(self.out_channels, use_bias=(l == 0),
                                 name=f"proj_l{l}")(sl))
        return jnp.concatenate(proj, axis=-2)


class TransBlockV2(nn.Module):
    l_max: int
    m_max: int
    sphere_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    ffn_hidden: int
    edge_channels: int
    grid_points: int
    deterministic: bool = True
    drop_path: float = 0.05
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    interpret: bool = False
    mxu_bf16: bool = False
    # reference-compatible variant (see SO2GraphAttention)
    m_share_rad: bool = True
    hidden_channels: int = 0
    atom_edge_embed: bool = False
    num_elements: int = 65
    rad_hidden: tuple = ()

    @nn.compact
    def __call__(self, x, ctx):
        ref = not self.m_share_rad
        norm_cls = RefEquivariantLayerNorm if ref else EquivariantLayerNorm
        res = x
        h = norm_cls(self.l_max, name="norm_1")(x)
        if self.use_pallas:
            h = PallasSO2GraphAttention(
                self.l_max, self.m_max, self.sphere_channels, self.num_heads,
                self.attn_alpha_channels, self.attn_value_channels,
                self.sphere_channels, self.edge_channels, self.grid_points,
                self.deterministic, interpret=self.interpret,
                mxu_bf16=self.mxu_bf16, name="ga",
            )(h, ctx["oh"], ctx["dcomp"], ctx["maskf"], ctx["xe"])
        else:
            h = SO2GraphAttention(
                self.l_max, self.m_max, self.sphere_channels, self.num_heads,
                self.attn_alpha_channels, self.attn_value_channels,
                self.sphere_channels, self.edge_channels, self.grid_points,
                self.deterministic, dtype=self.dtype,
                m_share_rad=self.m_share_rad,
                hidden_channels=self.hidden_channels,
                atom_edge_embed=self.atom_edge_embed,
                num_elements=self.num_elements,
                alpha_act="smooth_leaky" if ref else "silu",
                rad_hidden=self.rad_hidden, name="ga",
            )(h, ctx["nl"], ctx["d_t"], ctx["xe"],
              ctx.get("z_src"), ctx.get("z_dst"))
        if not self.deterministic and self.drop_path > 0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.drop_path, (x.shape[0], 1, 1, 1)
            )
            h = h * keep / (1.0 - self.drop_path)
        x = (res + h).astype(res.dtype)
        res = x
        h = norm_cls(self.l_max, name="norm_2")(x)
        ffn_cls = RefFFN if ref else GridFFN
        h = ffn_cls(self.l_max, self.ffn_hidden, self.sphere_channels,
                    self.grid_points, dtype=self.dtype, name="ffn")(h)
        if not self.deterministic and self.drop_path > 0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.drop_path, (x.shape[0], 1, 1, 1)
            )
            h = h * keep / (1.0 - self.drop_path)
        return res + h


@register_model("equiformer_v2")
class EquiformerV2(nn.Module):
    """Defaults follow reference config/model/equiformer_v2_oc20.yaml."""

    num_layers: int = 12
    sphere_channels: int = 128
    attn_alpha_channels: int = 64
    num_heads: int = 8
    attn_value_channels: int = 16
    ffn_hidden_channels: int = 128
    l_max: int = 6
    m_max: int = 2
    edge_channels: int = 128
    num_distance_basis: int = 128
    cutoff: float = 12.0
    max_neighbors: int = 30
    num_elements: int = 65
    # sphere-quadrature density: silu on the grid aliases above the band
    # limit, and the residual is exactly the equivariance error (the
    # reference's SO3_Grid has the same property); 4·(L+1)² keeps it ~1e-3
    grid_points_factor: int = 4
    deterministic: bool = True
    remat: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    # per-atom energy standardization (reference AddOffsets analog)
    energy_mean: float = 0.0
    energy_std: float = 1.0
    # fused Pallas attention kernel (ops/pallas/eqv2_attn); "auto" = on
    # for TPU. NOTE: different parameter layout than the XLA path.
    use_pallas: Union[bool, str] = "auto"
    # Reference-compatible parameterization (use_m_share_rad=False — the
    # published checkpoints, config/model/equiformer_v2_oc20.yaml): per-m
    # internal RadialFunction MLPs, per-block atom-edge embeddings, raw
    # 600-gaussian distance basis, exact 'layer_norm_sh', reference FFN +
    # edge-degree structure, energy / avg_num_nodes. XLA path only (the
    # fused kernel implements the m-shared variant). Build with
    # num_distance_basis=600 to match the reference GaussianSmearing.
    m_share_rad: bool = True
    attn_hidden_channels: int = 0  # 0 -> num_heads * attn_value_channels
    basis_width_scalar: float = 2.0
    avg_num_nodes: float = 39.65745326960467  # equiformer_v2_oc20.py:42
    avg_degree: float = 19.16009564536883  # equiformer_v2_oc20.py:43

    derivative_forces = False  # equivariant direct force head

    def _pallas_enabled(self) -> bool:
        if not self.m_share_rad:
            return False
        if self.use_pallas == "auto":
            # fp32 is excluded from "auto": the force-block backward kernel
            # exceeds VMEM with fp32 residuals (134 MB incl. 50 MB register
            # spills at r=1 on a 128 MB chip); bf16 MXU operands halve the
            # live set and fit. Explicit use_pallas=True overrides.
            return (jax.default_backend() != "cpu"
                    and jnp.dtype(self.compute_dtype) == jnp.bfloat16)
        return bool(self.use_pallas)

    @nn.compact
    def __call__(self, batch: MolBatch) -> ModelOutput:
        L, C = self.l_max, self.sphere_channels
        S = (L + 1) ** 2
        a_dim = batch.z.shape[1]
        gp = self.grid_points_factor * S
        nl = graph.neighbor_list(batch.pos, batch.node_mask, self.cutoff, self.max_neighbors)
        cdt = jnp.dtype(self.compute_dtype)
        pallas_on = self._pallas_enabled()
        interp = jax.default_backend() == "cpu"
        ctx = {"nl": nl}
        if pallas_on:
            # K-compacted edge tensors: the kernel gathers neighbor
            # features with the masked one-hot matmul `oh` (Mosaic has no
            # sublane gather), so the dense [B,A,A,·] lattice never exists
            # and the per-receiver SO2 pipelines run K=max_neighbors rows
            # (reference neighbor cap) instead of A. K is padded to the
            # 8-row sublane tile: Mosaic rejects the kernel's per-receiver
            # K-row block slices at off-tile row offsets.
            nl = graph.pad_neighbor_list(nl, 8)
            ctx["nl"] = nl
            maskf = nl.mask.astype(jnp.float32)
            rot_k = so3.rot_to_z(graph.edge_rotation_vectors(nl.unit, nl.mask))
            dcomp = so3.wigner_trunc_compact_from_rot(rot_k, L, self.m_max)
            dcomp = dcomp * maskf[..., None]
            oh = jax.nn.one_hot(nl.idx, a_dim, dtype=jnp.float32)
            oh = oh * maskf[..., None]
            ctx["dcomp"] = dcomp
            ctx["maskf"] = maskf
            ctx["oh"] = oh
            edge_dist = nl.dist
            z_src = graph.gather_nodes(batch.z[..., None], nl.idx)[..., 0]
            z_dst = jnp.broadcast_to(batch.z[:, :, None], z_src.shape)
        else:
            rot = so3.rot_to_z(graph.edge_rotation_vectors(nl.unit, nl.mask))
            d_t = so3.wigner_trunc_mmajor_from_rot(rot, L, self.m_max)
            ctx["d_t"] = d_t.astype(cdt)
            edge_dist = nl.dist
            z_src = graph.gather_nodes(batch.z[..., None], nl.idx)[..., 0]
            z_dst = jnp.broadcast_to(batch.z[:, :, None], z_src.shape)

        ref = not self.m_share_rad
        if ref:
            # reference GaussianSmearing(0, cutoff, n, width_scalar)
            # (smearing.py:12-29) — raw basis, no model-level projection or
            # embeddings (shipped config: share_atom_edge_embedding=false)
            centers = jnp.linspace(0.0, self.cutoff, self.num_distance_basis)
            coeff = -0.5 / (self.basis_width_scalar
                            * float(self.cutoff / (self.num_distance_basis - 1))) ** 2
            x_edge = jnp.exp(coeff * (edge_dist[..., None] - centers) ** 2)
            x_edge = x_edge.astype(jnp.float32)
            ctx["z_src"], ctx["z_dst"] = z_src, z_dst
        else:
            # invariant edge features: distance basis + endpoint embeddings
            dist_basis = gaussian_smearing(edge_dist, self.num_distance_basis, 0.0, self.cutoff)
            src_emb = nn.Embed(self.num_elements, self.edge_channels, name="src_embed")(z_src)
            dst_emb = nn.Embed(self.num_elements, self.edge_channels, name="dst_embed")(z_dst)
            x_edge = jnp.concatenate(
                [nn.Dense(self.edge_channels, name="dist_proj")(dist_basis), src_emb, dst_emb],
                axis=-1,
            )
            x_edge = jax.nn.silu(x_edge).astype(cdt if not pallas_on else jnp.float32)
        ctx["xe"] = x_edge

        # node init: l=0 atom embedding + edge-degree embedding
        emb = nn.Embed(self.num_elements, C, dtype=cdt, name="sphere_embedding")(batch.z)
        x = jnp.zeros((*batch.z.shape, S, C), emb.dtype)
        x = x.at[..., 0, :].set(emb)
        if ref:
            # reference EdgeDegreeEmbedding (input_block.py:11-121): own
            # source/target embeddings + RadialFunction to the m=0 rows
            u_init = nn.initializers.uniform(scale=0.002)
            se = nn.Embed(self.num_elements, self.edge_channels,
                          embedding_init=lambda k, s, d=jnp.float32:
                          u_init(k, s, d) - 0.001,
                          name="edge_degree_source_embedding")(z_src)
            te = nn.Embed(self.num_elements, self.edge_channels,
                          embedding_init=lambda k, s, d=jnp.float32:
                          u_init(k, s, d) - 0.001,
                          name="edge_degree_target_embedding")(z_dst)
            xe_deg = jnp.concatenate([x_edge, se, te], axis=-1)
            deg = RadialFn((self.edge_channels, self.edge_channels, (L + 1) * C),
                           name="edge_degree_rad")(xe_deg)
            deg = deg.reshape(*deg.shape[:-1], L + 1, C).astype(cdt)
        else:
            # edge-degree: m=0 radial vectors per l (the first L+1 m-major
            # rows), rotated back and averaged
            deg = nn.Dense((L + 1) * C, dtype=cdt, name="edge_degree_proj")(x_edge.astype(cdt))
            deg = deg.reshape(*deg.shape[:-1], L + 1, C)
        if pallas_on:
            # rotate back via the compact values: row (l,m=0) has
            # block-offset mrow = min(l,M)
            offs, _ = so3.trunc_compact_layout(L, self.m_max)
            deg_cols = []
            for l in range(L + 1):
                mc = min(l, self.m_max)
                base = offs[l] + mc * (2 * l + 1)
                dl = jax.lax.slice_in_dim(dcomp, base, base + 2 * l + 1, axis=-1)
                # neighbor sum INSIDE the einsum (dcomp is pre-masked) —
                # never materializes a [B,A,A,S,C] tensor
                deg_cols.append(jnp.einsum("bajn,bajc->banc", dl, deg[..., l, :]))
            deg_agg = jnp.concatenate(deg_cols, axis=-2)  # [B,A,S,C]
            x = x + deg_agg / jnp.sqrt(jnp.asarray(float(self.max_neighbors)))
        else:
            s_t = ctx["d_t"].shape[-2]
            deg_t = jnp.concatenate(
                [deg, jnp.zeros((*deg.shape[:-2], s_t - (L + 1), C), deg.dtype)],
                axis=-2,
            )
            deg_full = jnp.einsum("bakmn,bakmc->baknc", ctx["d_t"], deg_t)
            deg_full = jnp.where(nl.mask[..., None, None], deg_full, 0.0)
            rescale = (self.avg_degree if ref
                       else np.sqrt(float(self.max_neighbors)))
            x = x + deg_full.sum(axis=2) / jnp.asarray(rescale, deg_full.dtype)

        block_cls = TransBlockV2 if (pallas_on or not self.remat) else nn.remat(
            TransBlockV2
        )
        for i in range(self.num_layers):
            x = block_cls(
                L, self.m_max, C, self.num_heads, self.attn_alpha_channels,
                self.attn_value_channels, self.ffn_hidden_channels,
                self.edge_channels if ref else 3 * self.edge_channels,
                gp, self.deterministic, dtype=cdt,
                use_pallas=pallas_on, interpret=interp,
                mxu_bf16=(cdt == jnp.bfloat16),
                m_share_rad=self.m_share_rad,
                hidden_channels=self.attn_hidden_channels,
                atom_edge_embed=ref, num_elements=self.num_elements,
                rad_hidden=(self.edge_channels, self.edge_channels) if ref else (),
                name=f"block_{i}",
            )(x, ctx)

        norm_final_cls = RefEquivariantLayerNorm if ref else EquivariantLayerNorm
        x = norm_final_cls(L, name="norm_final")(x.astype(jnp.float32))
        if not pallas_on:
            ctx["d_t"] = ctx["d_t"].astype(jnp.float32)
        ctx["xe"] = x_edge.astype(jnp.float32)

        # energy head: FFN on node features, l=0 output
        if ref:
            e_feat = RefFFN(L, self.ffn_hidden_channels, 1, gp,
                            name="energy_block")(x)
            node_e = e_feat[..., 0, 0]
            energy = (jnp.sum(jnp.where(batch.node_mask, node_e, 0.0), axis=1)
                      / self.avg_num_nodes)
            n_atoms = batch.node_mask.sum(axis=1).astype(energy.dtype)
            energy = energy * self.energy_std + self.energy_mean * n_atoms
        else:
            e_feat = GridFFN(L, self.ffn_hidden_channels, 1, gp, name="energy_ffn")(x)
            node_e = e_feat[..., 0, 0] * self.energy_std + self.energy_mean
            energy = jnp.sum(jnp.where(batch.node_mask, node_e, 0.0), axis=1)

        # force head: 1-channel attention block, take l=1 (order y,z,x)
        if pallas_on:
            f_feat = PallasSO2GraphAttention(
                L, self.m_max, C, self.num_heads, self.attn_alpha_channels,
                self.attn_value_channels, 1, 3 * self.edge_channels, gp,
                self.deterministic, interpret=interp,
                mxu_bf16=(cdt == jnp.bfloat16), name="force_block",
            )(x, ctx["oh"], ctx["dcomp"], ctx["maskf"], ctx["xe"])
        else:
            f_feat = SO2GraphAttention(
                L, self.m_max, C, self.num_heads, self.attn_alpha_channels,
                self.attn_value_channels, 1,
                self.edge_channels if ref else 3 * self.edge_channels, gp,
                self.deterministic, name="force_block",
                m_share_rad=self.m_share_rad,
                hidden_channels=self.attn_hidden_channels,
                atom_edge_embed=ref, num_elements=self.num_elements,
                alpha_act="smooth_leaky" if ref else "silu",
                alpha_drop=0.0 if ref else 0.1,
                rad_hidden=(self.edge_channels, self.edge_channels) if ref else (),
            )(x, ctx["nl"], ctx["d_t"], ctx["xe"],
              ctx.get("z_src"), ctx.get("z_dst"))
        l1 = f_feat[..., 1:4, 0]  # (y, z, x)
        forces = jnp.stack([l1[..., 2], l1[..., 0], l1[..., 1]], axis=-1)
        forces = forces * batch.node_mask[..., None]
        return {"energy": energy, "forces": forces}
