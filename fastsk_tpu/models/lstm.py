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
    bidir: bool = False  # run_rnn.py --bidir

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
            if self.bidir:
                # forward + a reversed-sequence pass, final states
                # concatenated — nn.Bidirectional's return_carry shape
                # is awkward with seq_lengths, so run the two passes
                # explicitly (reverse each row's valid prefix)
                rev = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size),
                    return_carry=True,
                    name=f"lstm_rev_{layer}",
                )
                L = h.shape[1]
                idx = lengths[:, None] - 1 - jnp.arange(L)[None, :]
                idx = jnp.clip(idx, 0, L - 1)
                h_rev = jnp.take_along_axis(h, idx[..., None], axis=1)
                carry_f, _ = rnn(h, seq_lengths=lengths)
                carry_b, _ = rev(h_rev, seq_lengths=lengths)
                final_h = jnp.concatenate([carry_f[1], carry_b[1]], axis=-1)
                return nn.Dense(self.n_classes)(final_h)
            # seq_lengths freezes each sequence's carry past its length —
            # the pack_padded_sequence equivalent with static shapes
            carry, h = rnn(h, seq_lengths=lengths)
        # final hidden state of the top layer at the last valid step
        final_h = carry[1]  # (c, h) -> h
        return nn.Dense(self.n_classes)(final_h)
