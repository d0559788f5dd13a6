"""Contrastive training for the appearance/identity encoder.

Pairs with ``models/appearance.py``: two augmented views per identity
per batch, NT-Xent loss, data-parallel over the mesh. Used by
``eval.py --mode person`` to train identity invariance on synthetic
person variants (background/clothing/lighting change; identity
doesn't), replacing the geometric fallback as the reference's
0.6-weight face feature (``enhanced_person_detector.py:226-357`` role).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.appearance import (AppearanceConfig, AppearanceEncoder,
                                 init_appearance, nt_xent_loss)
from .mesh import DATA_AXIS, MeshContext
from .train import TrainState


def create_reid_train_state(cfg: Optional[AppearanceConfig] = None,
                            learning_rate: float = 1e-3, seed: int = 0):
    model, params = init_appearance(cfg, seed=seed)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(learning_rate, weight_decay=1e-4))
    return model, TrainState.create(apply_fn=model.apply, params=params,
                                    tx=tx)


def make_reid_train_step(model: AppearanceEncoder,
                         mesh: Optional[MeshContext] = None,
                         temperature: float = 0.1):
    """(state, view_a, view_b) → (state, metrics). Views are float
    [B, S, S, 3] in [0,1]; row i of both views is the same identity."""

    def step(state: TrainState, view_a: jax.Array, view_b: jax.Array):
        def loss_fn(params):
            ea = model.apply({"params": params}, view_a)
            eb = model.apply({"params": params}, view_b)
            return nt_xent_loss(ea, eb, temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    data = NamedSharding(mesh.mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, data, data),
                   donate_argnums=(0,))
