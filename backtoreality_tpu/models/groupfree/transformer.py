"""Transformer decoder layer
(`detection/GroupFree3D/models/transformer.py:10-76`).

Post-norm DETR-style layer: self-attention over the queries,
cross-attention to the seed keys, FFN — position embeddings are
*added to Q/K/V at every layer* (not once at the input). The vendored
torch MultiheadAttention (`multi_head_attention.py:12-398`) maps to
flax's dot-product attention with combined in/out projections.
"""

import jax.numpy as jnp
from flax import linen as nn
from backtoreality_tpu.nn.mlp import (
    torch_default_bias_init,
    torch_default_kernel_init,
)


class TransformerDecoderLayer(nn.Module):
    d_model: int = 288
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos_embed, key_pos_embed, *,
                 train: bool):
        """query (B, Pq, C); key (B, Pk, C); pos embeds same shapes
        (already projected to C by PositionEmbeddingLearned) or None."""

        def with_pos(x, pos):
            return x if pos is None else x + pos

        deterministic = not train
        dropout = nn.Dropout(self.dropout_rate)

        q = with_pos(query, query_pos_embed)
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model, dropout_rate=self.dropout_rate,
            deterministic=deterministic, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="self_attn")(q, q, q)
        query = query + dropout(attn_out, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model, dropout_rate=self.dropout_rate,
            deterministic=deterministic, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="cross_attn")(
            with_pos(query, query_pos_embed),
            with_pos(key, key_pos_embed),
            with_pos(key, key_pos_embed))
        query = query + dropout(attn_out, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)

        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                      kernel_init=torch_default_kernel_init,
                      bias_init=torch_default_bias_init(self.d_model),
                      name="linear1")(query)
        ff = nn.relu(ff)
        ff = dropout(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype,
                      kernel_init=torch_default_kernel_init,
                      bias_init=torch_default_bias_init(
                          self.dim_feedforward),
                      name="linear2")(ff)
        query = query + dropout(ff, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)
        return query
