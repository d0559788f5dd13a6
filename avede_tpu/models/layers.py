"""Shared transformer building blocks (flax.linen).

One pre-LayerNorm transformer core serves CLIP, BLIP, OWL-ViT and the
temporal-grounding head — the reference instead carries four separate
HuggingFace/torch stacks. Attention is expressed as batched einsums so
XLA tiles them onto the MXU, and head/MLP dimensions are the natural
tensor-parallel axes (sharding is annotated at the pjit level, see
``parallel/train.py``).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "quick_gelu": quick_gelu,
    "gelu": nn.gelu,
    "relu": nn.relu,
    "silu": nn.silu,
}


class MultiHeadAttention(nn.Module):
    """Standard MHA with optional causal masking and cross-attention.

    Matches HF CLIP/BLIP attention numerics (bias on q/k/v/out, scale
    1/sqrt(head_dim)) so converted weights reproduce reference outputs.
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False      # Pallas flash kernel (self-attn, no
    # mask/causal, L divisible by its block) — opt-in for long-seq ViTs

    @nn.compact
    def __call__(self, x: jax.Array, kv: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 causal: bool = False) -> jax.Array:
        kv = x if kv is None else kv
        head_dim = self.dim // self.num_heads
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(kv)
        v = dense("v_proj")(kv)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.use_flash and mask is None and not causal:
            from ..ops.attention import flash_attention

            import jax as _jax

            interp = _jax.devices()[0].platform in ("cpu", "gpu")
            out = flash_attention(
                q.transpose(0, 2, 1, 3).astype(jnp.float32),
                k.transpose(0, 2, 1, 3).astype(jnp.float32),
                v.transpose(0, 2, 1, 3).astype(jnp.float32),
                block_q=64, block_k=64, interpret=interp)
            out = out.transpose(0, 2, 1, 3).astype(self.dtype)
            out = out.reshape(out.shape[0], out.shape[1], self.dim)
            return dense("out_proj")(out)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(head_dim, scores.dtype))
        if causal:
            ql, kl = scores.shape[-2], scores.shape[-1]
            cmask = jnp.tril(jnp.ones((ql, kl), dtype=bool))
            scores = jnp.where(cmask, scores, jnp.finfo(scores.dtype).min)
        if mask is not None:
            # mask: [B, K] (1 = attend) or broadcastable to [B, H, Q, K]
            if mask.ndim == 2:
                mask = mask[:, None, None, :]
            scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(out.shape[0], out.shape[1], self.dim)
        return dense("out_proj")(out)


class MLP(nn.Module):
    dim: int
    hidden_dim: int
    activation: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = ACTIVATIONS[self.activation]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(act(h))


class TransformerBlock(nn.Module):
    """Pre-LN block: x + attn(ln1(x)); x + mlp(ln2(x))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    activation: str = "quick_gelu"
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 causal: bool = False) -> jax.Array:
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + MultiHeadAttention(self.dim, self.num_heads, self.dtype,
                                   use_flash=self.use_flash,
                                   name="self_attn")(h, mask=mask, causal=causal)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        x = x + MLP(self.dim, int(self.dim * self.mlp_ratio),
                    self.activation, self.dtype, name="mlp")(h)
        return x


class Transformer(nn.Module):
    """A stack of pre-LN blocks with statically named layers
    (``layers_i``) so torch checkpoints convert one-to-one."""

    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    activation: str = "quick_gelu"
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 causal: bool = False) -> jax.Array:
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(self.depth):
            blk = block_cls(self.dim, self.num_heads, self.mlp_ratio,
                            self.activation, self.ln_eps, self.dtype,
                            self.use_flash,
                            name=f"layers_{i}")
            x = blk(x, mask, causal) if not self.remat else blk(x, mask, causal)
        return x
