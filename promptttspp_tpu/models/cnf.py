"""Flow-matching CNF (`/root/reference/promptttspp/modules/cnf.py:22-60`,
SURVEY.md §2.7): linear-interpolation conditional flow matching with
classifier-free guidance sampling. The reference integrates with
torchdiffeq ``odeint``; here sampling is a fixed-step RK4/Euler
``lax.scan`` — compiles once, no host control flow.

[B, T, C] layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class CNF(nn.Module):
    net: nn.Module
    out_channels: int
    cfg: float = 5.0

    def __call__(self, x1, cond, mask=None, t=None, x0=None,
                 train: bool = False):
        """Training: returns (ut, vt) — target velocity and prediction
        (`cnf.py:30-40`)."""
        B = x1.shape[0]
        if t is None:
            t = jax.random.uniform(self.make_rng("diffusion"), (B,))
        if x0 is None:
            x0 = jax.random.normal(self.make_rng("diffusion"), x1.shape,
                                   x1.dtype)
        xt = t[:, None, None] * x1 + (1 - t[:, None, None]) * x0
        ut = x1 - x0
        vt = self.net(xt, t, cond, mask)
        return ut, vt

    def sample(self, cond, sample_step: int, method: str = "euler",
               do_cfg: bool = False, rng=None, x0=None):
        """ODE integration from t=1 -> ~0 (`cnf.py:42-60`)."""
        B, T = cond.shape[0], cond.shape[1]
        if x0 is None:
            rng = rng if rng is not None else self.make_rng("diffusion")
            x0 = jax.random.normal(rng, (B, T, self.out_channels))

        zero_cond = jnp.zeros_like(cond)

        def f(t_scalar, y):
            t = jnp.full((B,), t_scalar)
            if do_cfg:
                return ((1 + self.cfg) * self.net(y, t, cond)
                        - self.cfg * self.net(y, t, zero_cond))
            return self.net(y, t, cond)

        ts = jnp.linspace(1.0, 1e-5, sample_step)

        def step(y, inputs):
            t, t_next = inputs
            h = t_next - t
            if method == "euler":
                y = y + h * f(t, y)
            elif method == "rk4":
                k1 = f(t, y)
                k2 = f(t + h / 2, y + h / 2 * k1)
                k3 = f(t + h / 2, y + h / 2 * k2)
                k4 = f(t + h, y + h * k3)
                y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            else:
                raise ValueError(method)
            return y, None

        y, _ = jax.lax.scan(step, x0, (ts[:-1], ts[1:]))
        return y
