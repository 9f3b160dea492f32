"""Learning-rate schedules.

Optax-native equivalents of the reference's scheduler inventory:
  * linear / polynomial warmup-decay (nablaDFT/schedulers.py:6,65,
    HF-style);
  * cosine / multistep with warmup (equiformer_v2/lr_scheduler.py:88-169);
  * ReduceLROnPlateau — inherently host-driven (it depends on the val
    metric), implemented as a mutable multiplier the Trainer folds into the
    injected learning rate between epochs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def linear_warmup_decay(
    base_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """LR ramps 0→base over warmup, then linearly back to 0 at total_steps."""

    def schedule(step):
        warm = step / max(1, warmup_steps)
        decay = (total_steps - step) / max(1, total_steps - warmup_steps)
        import jax.numpy as jnp

        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return schedule


def polynomial_warmup_decay(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    lr_end: float = 1e-7,
    power: float = 1.0,
) -> optax.Schedule:
    """HF-style polynomial decay with warmup (reference schedulers.py:65)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * step / max(1, warmup_steps)
        frac = 1.0 - (step - warmup_steps) / max(1, total_steps - warmup_steps)
        frac = jnp.clip(frac, 0.0, 1.0)
        decayed = (base_lr - lr_end) * frac**power + lr_end
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def cosine_warmup(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr_factor: float = 0.01,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=base_lr * 0.01,
        peak_value=base_lr,
        warmup_steps=max(1, warmup_steps),
        decay_steps=max(2, total_steps),
        end_value=base_lr * min_lr_factor,
    )


def multistep_warmup(
    base_lr: float, warmup_steps: int, milestones: Sequence[int], gamma: float = 0.1
) -> optax.Schedule:
    boundaries = {int(m): gamma for m in milestones}
    decay = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * step / max(1, warmup_steps)
        return jnp.where(step < warmup_steps, warm, decay(step))

    return schedule


@dataclass
class PlateauState:
    """ReduceLROnPlateau bookkeeping (reference default: factor 0.8,
    patience 10, min_lr 1e-6 — config/model/painn.yaml scheduler_args)."""

    factor: float = 0.8
    patience: int = 10
    min_lr: float = 1e-6
    best: float = float("inf")
    bad_epochs: int = 0
    multiplier: float = 1.0

    def step(self, metric: float, base_lr: float) -> float:
        """Record a validation metric; returns the new effective LR."""
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.multiplier *= self.factor
                self.bad_epochs = 0
        return max(base_lr * self.multiplier, self.min_lr)


def build_schedule(
    kind: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    **kwargs,
) -> Optional[optax.Schedule]:
    """None for 'constant'/'plateau' (plateau is applied host-side)."""
    if kind in ("constant", "plateau"):
        return None
    if kind == "linear":
        return linear_warmup_decay(base_lr, warmup_steps, total_steps)
    if kind == "polynomial":
        return polynomial_warmup_decay(base_lr, warmup_steps, total_steps, **kwargs)
    if kind == "cosine":
        return cosine_warmup(base_lr, warmup_steps, total_steps, **kwargs)
    if kind == "multistep":
        return multistep_warmup(base_lr, warmup_steps, **kwargs)
    raise KeyError(f"unknown schedule {kind!r}")


# ---------------------------------------------------------------------------
# Lookahead (PhiSNet legacy trainer parity)
# ---------------------------------------------------------------------------


class LookaheadState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    slow: optax.Params  # slow-weight copy


def lookahead(k: int = 5, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (Zhang et al. 2019) as a plain GradientTransformation.

    Chain it AFTER the inner optimizer: the incoming `updates` are the inner
    step. Every `k` steps the fast weights are pulled toward the slow copy:
    p_new = slow + alpha * (p_fast - slow), and the slow copy syncs to p_new.
    Unlike optax.lookahead this needs no LookaheadParams param wrapping, so
    it composes with any existing train state / checkpoint layout.

    Reference: phisnet/training/lookahead.py:8 (la_steps / la_alpha flags).
    """

    def init(params):
        # NB: a genuine copy — aliasing the param buffers would make the
        # engine's donate_argnums donate the same buffer twice.
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree_util.tree_map(lambda p: jnp.asarray(p).copy(), params),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % k) == 0

        def synced(_):
            new_p = jax.tree_util.tree_map(
                lambda s, p, u: s + alpha * (p + u - s),
                state.slow, params, updates,
            )
            out_updates = jax.tree_util.tree_map(
                lambda np_, p: np_ - p, new_p, params
            )
            return out_updates, new_p

        def passthrough(_):
            return updates, state.slow

        out_updates, new_slow = jax.lax.cond(sync, synced, passthrough, None)
        return out_updates, LookaheadState(count=count, slow=new_slow)

    return optax.GradientTransformation(init, update)
