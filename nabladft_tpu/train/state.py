"""Train state: params + optimizer + EMA in one replicated pytree."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation, ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """ema <- decay * ema + (1-decay) * params (torch-ema semantics used by
    QHNet, reference qhnet/qhnet.py:459-460 and PhiSNet train.py:369)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Rewrite the injected learning_rate hyperparameter (plateau control)."""

    def rewrite(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or hasattr(node, "hyperparams"):
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
                return node._replace(hyperparams=hp)
        return node

    if hasattr(opt_state, "hyperparams"):
        return rewrite(opt_state)
    # search one level down (chained transforms)
    if isinstance(opt_state, tuple):
        return tuple(set_learning_rate(s, lr) if hasattr(s, "hyperparams") else s for s in opt_state)
    return opt_state


def current_learning_rate(opt_state: Any) -> Optional[float]:
    if hasattr(opt_state, "hyperparams"):
        lr = opt_state.hyperparams.get("learning_rate")
        return float(lr) if lr is not None else None
    if isinstance(opt_state, tuple):
        for s in opt_state:
            out = current_learning_rate(s)
            if out is not None:
                return out
    return None
