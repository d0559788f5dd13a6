"""Training: CLIP contrastive fine-tuning step, SPMD over the mesh.

The reference is inference-only (SURVEY.md §2.7) — this subsystem is a
TPU-native capability extension: fine-tune the retrieval backbone (and,
via the same machinery, the temporal-grounding head) on event data.

Parallelism layout:
- **data axis**: batch sharded (images and token ids);
- **model axis**: Megatron-style tensor parallelism on every
  transformer block — fc1 / q,k,v kernels column-sharded
  ``P(None, "model")``, fc2 / out_proj row-sharded ``P("model", None)``
  — XLA inserts the all-reduces from the sharding annotations;
- contrastive logits ``[B, B]`` induce an all-gather of the (tiny)
  embedding matrices over ``data``.

Pipeline/sequence/expert parallelism are deliberately absent: at
ViT-B/32 scale (≈150 M params, 50-token sequences) they cost more in
collective latency than they save (SURVEY.md §2.7, §5).
"""

from __future__ import annotations


from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.clip import CLIPConfig, CLIPModel, init_clip
from .mesh import DATA_AXIS, MODEL_AXIS, MeshContext

COLUMN_SHARDED = ("fc1", "q_proj", "k_proj", "v_proj")
ROW_SHARDED = ("fc2", "out_proj")


def param_spec(path: Tuple[str, ...], leaf: Any) -> P:
    """Tensor-parallel PartitionSpec for a param by tree path."""
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    parent = names[-2] if len(names) >= 2 else ""
    kind = names[-1]
    if parent in COLUMN_SHARDED:
        if kind == "kernel":
            return P(None, MODEL_AXIS)
        if kind == "bias":
            return P(MODEL_AXIS)
    if parent in ROW_SHARDED and kind == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def shard_params(params: Dict, mesh: MeshContext) -> Dict:
    specs = jax.tree_util.tree_map_with_path(param_spec, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh.mesh, s)),
        params, specs)


def param_shardings(params: Dict, mesh: MeshContext) -> Dict:
    specs = jax.tree_util.tree_map_with_path(param_spec, params)
    return jax.tree.map(lambda s: NamedSharding(mesh.mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


class TrainState(train_state.TrainState):
    pass


def clip_contrastive_loss(img_emb: jax.Array, txt_emb: jax.Array,
                          logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the global batch."""
    logits = logit_scale * jnp.dot(img_emb, txt_emb.T,
                                   preferred_element_type=jnp.float32)
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (li.mean() + lt.mean())


def create_train_state(cfg: Optional[CLIPConfig] = None,
                       mesh: Optional[MeshContext] = None,
                       learning_rate: float = 1e-4,
                       seed: int = 0) -> Tuple[CLIPModel, TrainState]:
    model, params = init_clip(cfg, seed=seed)
    if mesh is not None:
        params = shard_params(params, mesh)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(learning_rate, weight_decay=0.05))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    return model, state


def make_train_step(model: CLIPModel, mesh: MeshContext):
    """Jitted SPMD train step: (state, images, ids) → (state, metrics).

    images: uint8/float [B, S, S, 3] CLIP-normalized pixels
    ids:    int32 [B, L]
    """
    data_sharded = NamedSharding(mesh.mesh, P(DATA_AXIS))

    def step(state: TrainState, images: jax.Array, ids: jax.Array):
        def loss_fn(params):
            img, txt, scale = model.apply({"params": params}, images, ids)
            return clip_contrastive_loss(img, txt, scale)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(
        step,
        in_shardings=(None, data_sharded, data_sharded),
        donate_argnums=(0,),
    )


def make_grounding_train_step(model, mesh: MeshContext):
    """SPMD train step for the temporal-grounding head
    (``models/univtg.py``): batch shards over ``data``; the head is
    small enough to replicate."""
    from ..models.univtg import grounding_loss

    data_sharded = NamedSharding(mesh.mesh, P(DATA_AXIS))

    def step(state: TrainState, frame_emb, text_emb, sal_labels,
             off_labels, valid):
        def loss_fn(params):
            sal, off = model.apply({"params": params}, frame_emb,
                                   text_emb, valid)
            return grounding_loss(sal, off, sal_labels, off_labels, valid)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return jax.jit(step, in_shardings=(None,) + (data_sharded,) * 5,
                   donate_argnums=(0,))


def make_caption_train_step(model, pad_token_id: int,
                            mesh: Optional[MeshContext] = None):
    """Teacher-forced BLIP caption training: CE of logits[t] against
    ids[t+1], pad positions masked. The reference ships no captioner
    training at all (its BLIP is a frozen download); this is what makes
    ``eval.py --mode caption`` able to PROVE the decode path emits real
    text end-to-end."""

    def step(state: TrainState, pixels: jax.Array, ids: jax.Array):
        def loss_fn(params):
            logits = model.apply({"params": params}, pixels, ids)
            targets = ids[:, 1:]
            mask = (targets != pad_token_id).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None], axis=-1)[..., 0]
            return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    data = NamedSharding(mesh.mesh, P(DATA_AXIS))
    return jax.jit(step, in_shardings=(None, data, data),
                   donate_argnums=(0,))


def create_grounding_train_state(cfg=None, learning_rate: float = 1e-3,
                                 seed: int = 0):
    from ..models.univtg import init_grounding

    model, params = init_grounding(cfg, seed=seed)
    tx = optax.adamw(learning_rate, weight_decay=0.01)
    return model, TrainState.create(apply_fn=model.apply, params=params,
                                    tx=tx)


# ---------------------------------------------------------------------------
# checkpoint / resume (orbax)
# ---------------------------------------------------------------------------

def save_checkpoint(state: TrainState, path: str, step: int) -> str:
    """Orbax checkpoint of a train state (checkpoint/resume subsystem —
    the reference has none; SURVEY.md §5)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave({
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step}))
        mgr.wait_until_finished()
    return path


def restore_checkpoint(state: TrainState, path: str,
                       step: Optional[int] = None) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        restored = mgr.restore(step, args=ocp.args.StandardRestore({
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step}))
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def train_demo(n_steps: int = 2, batch: int = 8,
               mesh: Optional[MeshContext] = None,
               cfg: Optional[CLIPConfig] = None) -> Dict[str, float]:
    """Tiny smoke-train loop (used by tests and the multichip dryrun)."""
    from ..models.clip import tiny_test_config
    from .mesh import get_mesh

    mesh = mesh or get_mesh()
    cfg = cfg or tiny_test_config()
    model, state = create_train_state(cfg, mesh)
    step = make_train_step(model, mesh)
    rng = np.random.default_rng(0)
    # one fixed batch → loss must decrease (overfit smoke check)
    images = jnp.asarray(
        rng.normal(size=(batch, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32))
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size - 2,
                     size=(batch, cfg.max_text_len)).astype(np.int32))
    ids = ids.at[:, -1].set(cfg.vocab_size - 1)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, images, ids)
        losses.append(float(metrics["loss"]))
    return {"first_loss": losses[0], "last_loss": losses[-1]}
