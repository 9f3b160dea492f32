"""Model-zoo base: the NNP protocol, force computation, and the registry.

Protocol (the analog of the reference's per-model `*Lightning` wrappers,
e.g. painn_pyg/painn.py:623): every model is a flax module whose
``__call__(batch: MolBatch) -> Dict[str, Array]`` returns at least
``energy:[B]``; direct-force models also return ``forces:[B,A,3]``.
Models declare ``derivative_forces = True`` when forces must come from
``-∂E/∂pos`` (SchNet/PaiNN/DimeNet++ semantics; reference
dimenetplusplus.py:99-109 uses torch.autograd.grad — here it is one
`jax.value_and_grad`, which XLA differentiates through the whole padded
graph with no second host round trip).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from nabladft_tpu.data.batch import MolBatch

ModelOutput = Dict[str, jnp.ndarray]


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x) - log(2): zero at x=0 (SchNet's activation)."""
    return jax.nn.softplus(x) - 0.6931471805599453


class MLP(nn.Module):
    """Dense stack with configurable activation; last layer linear."""

    features: Sequence[int]
    activation: Callable = jax.nn.silu
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
        return x


def forward(model: nn.Module, variables: Any, batch: MolBatch, train: bool = False,
            rngs: Optional[Dict[str, jax.Array]] = None) -> ModelOutput:
    """Run a model, deriving forces by autograd when the model requires it.

    The energy gradient of molecule b only touches pos[b], so one
    value_and_grad over the whole padded batch yields all per-molecule
    forces; masks keep padding gradients at exactly zero.
    """
    kwargs = {}
    if rngs:
        kwargs["rngs"] = rngs
    if getattr(model, "derivative_forces", False):
        def energy_sum(pos):
            out = model.apply(variables, batch.replace(pos=pos), **kwargs)
            e = jnp.where(batch.graph_mask, out["energy"], 0.0)
            return e.sum(), out

        (_, out), grad = jax.value_and_grad(energy_sum, has_aux=True)(batch.pos)
        forces = -grad * batch.node_mask[..., None]
        out = dict(out)
        out["forces"] = forces
        return out
    return model.apply(variables, batch, **kwargs)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

MODEL_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register_model(name: str):
    def deco(cls: Type[nn.Module]) -> Type[nn.Module]:
        MODEL_REGISTRY[name.lower()] = cls
        cls.registry_name = name.lower()
        return cls

    return deco


def create_model(name: str, **kwargs) -> nn.Module:
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key](**kwargs)
