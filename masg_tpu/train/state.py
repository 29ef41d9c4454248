"""Train state pytree: params + postnet batch stats + optimizer state."""

from __future__ import annotations

from typing import Any

import flax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Extends flax TrainState with BatchNorm running statistics (PostNet)
    and optional frozen discriminator variables."""

    batch_stats: Any = None


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
    )
