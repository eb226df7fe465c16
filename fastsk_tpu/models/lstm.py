"""Character-level LSTM baseline (flax).

Parity with the reference's SeqLSTM (results/neural_nets/models.py:9-69):
embedding -> (optionally stacked) LSTM -> linear head on the final hidden
state of the last *valid* timestep. Variable lengths are handled with a
mask over a static [B, L] layout instead of pack_padded_sequence — the
per-step carry freezes once t >= length, which is exactly what packing
computes, with compiler-friendly static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SeqLSTM(nn.Module):
    vocab_size: int
    embedding_size: int = 64
    hidden_size: int = 128
    n_classes: int = 2
    n_layers: int = 1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        # tokens: [B, L] int32 (0 = pad), lengths: [B]
        x = nn.Embed(self.vocab_size, self.embedding_size)(tokens)
        h = x
        carry = None
        for layer in range(self.n_layers):
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                return_carry=True,
                name=f"lstm_{layer}",
            )
            # seq_lengths freezes each sequence's carry past its length —
            # the pack_padded_sequence equivalent with static shapes
            carry, h = rnn(h, seq_lengths=lengths)
        # final hidden state of the top layer at the last valid step
        final_h = carry[1]  # (c, h) -> h
        return nn.Dense(self.n_classes)(final_h)
