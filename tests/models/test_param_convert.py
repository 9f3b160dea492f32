"""One checkpoint, two execution modes: the fused-Pallas and XLA parameter
layouts of eSCN/EquiformerV2 are losslessly interconvertible, and
`load_params_for` remaps a saved checkpoint to whatever layout the loading
model resolves to (STATUS gap 0d / ADVICE r2). Numeric cross-mode parity of
the remapped trees is pinned by tests/ops/test_escn_layer.py and
tests/ops/test_eqv2_attn.py which use these same converters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models import create_model
from nabladft_tpu.models.param_convert import (
    convert_params,
    eqv2_params,
    escn_params,
    params_layout,
)
from nabladft_tpu.train.checkpoints import load_params_for, save_params

ESCN_KW = dict(num_layers=2, l_max=2, m_max=1, sphere_channels=8, hidden=16,
               edge_channels=8, cutoff=6.0, max_neighbors=7,
               num_sphere_samples=16, distance_resolution=0.5)
EQV2_KW = dict(num_layers=1, l_max=2, m_max=1, sphere_channels=8,
               attn_alpha_channels=8, num_heads=2, attn_value_channels=4,
               ffn_hidden_channels=8, cutoff=6.0, max_neighbors=7)


def _batch(rng, b=2, a=6):
    return MolBatch(
        z=rng.integers(1, 9, (b, a)).astype(np.int32),
        pos=(rng.normal(size=(b, a, 3)) * 1.5).astype(np.float32),
        node_mask=np.ones((b, a), bool),
        graph_mask=np.ones((b,), bool),
        energy=rng.normal(size=(b,)).astype(np.float32),
        forces=rng.normal(size=(b, a, 3)).astype(np.float32),
        mol_id=np.arange(b, dtype=np.int32),
    )


def _trees_equal(a, b):
    la, sa = jax.tree_util.tree_flatten(a)
    lb, sb = jax.tree_util.tree_flatten(b)
    assert sa == sb, f"structure mismatch:\n{sa}\nvs\n{sb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_escn_roundtrip_and_structure():
    batch = _batch(np.random.default_rng(0))
    m_x = create_model("escn", **ESCN_KW, use_pallas=False)
    p_x = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)
    p_pl = escn_params(p_x, "pallas")
    # round trip is the identity
    _trees_equal(escn_params(p_pl, "xla"), p_x)
    # converted tree has exactly the pallas model's structure
    m_pl = create_model("escn", **ESCN_KW, use_pallas=True)
    shapes = jax.eval_shape(m_pl.init, jax.random.PRNGKey(0), batch)
    s_conv = jax.tree_util.tree_map(lambda x: jnp.shape(x), p_pl)
    s_want = jax.tree_util.tree_map(lambda x: x.shape, shapes)
    assert jax.tree_util.tree_structure(s_conv) == jax.tree_util.tree_structure(s_want)
    assert jax.tree_util.tree_leaves(s_conv) == jax.tree_util.tree_leaves(s_want)
    # converting to the layout it's already in is a no-op
    _trees_equal(escn_params(p_x, "xla"), p_x)


def test_eqv2_roundtrip_and_structure():
    batch = _batch(np.random.default_rng(1))
    co = EQV2_KW["num_heads"] * EQV2_KW["attn_value_channels"]
    m_x = create_model("equiformer_v2", **EQV2_KW, use_pallas=False)
    p_x = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)
    p_pl = eqv2_params(p_x, "pallas", EQV2_KW["l_max"], EQV2_KW["m_max"], co)
    _trees_equal(
        eqv2_params(p_pl, "xla", EQV2_KW["l_max"], EQV2_KW["m_max"], co), p_x
    )
    m_pl = create_model("equiformer_v2", **EQV2_KW, use_pallas=True)
    shapes = jax.eval_shape(m_pl.init, jax.random.PRNGKey(0), batch)
    s_conv = jax.tree_util.tree_map(lambda x: jnp.shape(x), p_pl)
    s_want = jax.tree_util.tree_map(lambda x: x.shape, shapes)
    assert jax.tree_util.tree_structure(s_conv) == jax.tree_util.tree_structure(s_want)
    assert jax.tree_util.tree_leaves(s_conv) == jax.tree_util.tree_leaves(s_want)


def test_checkpoint_loads_across_modes(tmp_path):
    """Save an XLA-mode eSCN checkpoint, load it for a pallas-mode model:
    load_params_for converts the layout and the evaluation is identical
    (checked in XLA mode both ways; pallas-mode numeric parity of this
    exact conversion is pinned by tests/ops/test_escn_layer.py)."""
    batch = _batch(np.random.default_rng(2))
    m_x = create_model("escn", **ESCN_KW, use_pallas=False)
    p_x = jax.jit(m_x.init)(jax.random.PRNGKey(0), batch)
    path = tmp_path / "escn.ckpt"
    save_params(p_x, path)

    m_pl = create_model("escn", **ESCN_KW, use_pallas=True)
    assert params_layout(m_pl) == "pallas"
    p_loaded = load_params_for(m_pl, path)
    # pallas layout on load...
    assert "wg" in p_loaded["params"]["layer_0"]
    # ...and converting back reproduces the saved evaluation exactly
    p_back = convert_params(m_x, p_loaded)
    out_a = m_x.apply(p_x, batch)
    out_b = m_x.apply(p_back, batch)
    np.testing.assert_array_equal(
        np.asarray(out_a["energy"]), np.asarray(out_b["energy"])
    )


def test_engine_rejects_mismatched_layout(tmp_path):
    """A full TrainState checkpoint saved in one layout must fail fast with
    an actionable message when restored into the other."""
    from nabladft_tpu.train import Trainer, TrainerConfig

    batch = _batch(np.random.default_rng(3))

    class OneBatchModule:
        def train_dataloader(self):
            return [batch]

        val_dataloader = train_dataloader

    cfg = TrainerConfig(max_epochs=1, lr=1e-4, schedule="plateau",
                        loss_specs={"energy": "mse"}, ckpt_dir=str(tmp_path),
                        save_top_k=0, n_dp=1, fit_scale_factors=False)
    m_x = create_model("escn", **ESCN_KW, use_pallas=False)
    tr = Trainer(m_x, cfg)
    tr.fit(OneBatchModule())

    m_pl = create_model("escn", **ESCN_KW, use_pallas=True)
    tr2 = Trainer(m_pl, TrainerConfig(**{**cfg.__dict__}))
    with pytest.raises(ValueError, match="parameter\\s+layout|params_layout|layout"):
        tr2.fit(OneBatchModule(), ckpt_path=str(tmp_path / "last.ckpt"))
