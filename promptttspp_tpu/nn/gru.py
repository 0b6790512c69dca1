"""GRU with torch gate semantics, as a lax.scan.

The reference encoder uses ``torch.nn.GRU`` with ``pack_padded_sequence``
(`/root/reference/promptttspp/modules/reference_encoder.py:109-121`) and
keeps only the final hidden state per sequence. Torch gate math (r, z, n
ordering, separate input/hidden biases, ``n = tanh(Wi x + bi + r*(Wh h +
bh))``) is reproduced exactly; packed semantics become a masked carry:
``h_t = where(t < length, cell(h, x_t), h_{t-1})``, so the returned state
is the hidden at each sequence's true last step.

Weights are stored torch-shaped (w_ih [3H, I], w_hh [3H, H], b_ih, b_hh
[3H]) to make checkpoint conversion the identity map. The input projection
x @ w_ih^T for ALL timesteps is hoisted out of the scan into one big MXU
matmul; only the [H,H] recurrences stay sequential.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRU(nn.Module):
    """Single-direction multi-layer GRU; returns final hidden state [B, H]."""

    input_size: int
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, xs, lengths=None):
        """xs [B, T, I]; lengths [B] or None -> h_last of top layer [B, H]."""
        B, T, _ = xs.shape
        H = self.hidden_size
        k = 1.0 / (H ** 0.5)

        def init(key, shape, dtype=jnp.float32):  # torch U(-k, k)
            return jax.random.uniform(key, shape, dtype, -k, k)

        h_out = None
        layer_in = xs
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else H
            w_ih = self.param(f"weight_ih_l{layer}", init, (3 * H, in_size))
            w_hh = self.param(f"weight_hh_l{layer}", init, (3 * H, H))
            b_ih = self.param(f"bias_ih_l{layer}", init, (3 * H,))
            b_hh = self.param(f"bias_hh_l{layer}", init, (3 * H,))

            # hoist input projection out of the scan: [B, T, 3H]
            gi_all = jnp.einsum("bti,gi->btg", layer_in, w_ih) + b_ih

            def step(carry, inputs, w_hh=w_hh, b_hh=b_hh):
                h, h_last = carry
                gi, valid = inputs  # gi [B, 3H], valid [B, 1]
                gh = h @ w_hh.T + b_hh
                i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = nn.sigmoid(i_r + h_r)
                z = nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1.0 - z) * n + z * h
                h_new = jnp.where(valid, h_new, h)
                h_last_new = jnp.where(valid, h_new, h_last)
                return (h_new, h_last_new), h_new

            if lengths is None:
                valid = jnp.ones((T, B, 1), dtype=bool)
            else:
                valid = (
                    jnp.arange(T)[:, None] < lengths[None, :]
                )[:, :, None]

            h0 = jnp.zeros((B, H), xs.dtype)
            (h_final, h_last), ys = jax.lax.scan(
                step, (h0, h0), (gi_all.transpose(1, 0, 2), valid)
            )
            layer_in = ys.transpose(1, 0, 2)  # [B, T, H]
            h_out = h_last

        return h_out
