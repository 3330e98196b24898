"""Core dense building blocks (flax linen).

`MLP` replicates the reference MLP semantics exactly
(`reference equihgnn/models/layers/mlp.py:6-118`): optional input norm, then
[Linear → ReLU → Norm → Dropout]×(L-1) → Linear, with Normalization in
{"bn", "ln", "None"}.

Because TPU batches are padded, BatchNorm must ignore padding rows —
`MaskedBatchNorm` computes masked batch statistics (and cross-replica
statistics via `axis_name` under `shard_map`, replacing Lightning DDP's
per-replica BN).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_init(key, fan_in: int, shape, dtype):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default initialization.

    Keeps initial weight/bias variance identical to the PyTorch reference so
    training dynamics match from step 0.
    """

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None  # overrides the torch default
    bias_init: Optional[Callable] = None  # overrides the torch default
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.kernel_init is not None:
            kernel = self.param("kernel", self.kernel_init, (fan_in, self.features))
        else:
            kernel = self.param(
                "kernel",
                lambda k, s: _torch_linear_init(k, fan_in, s, jnp.float32),
                (fan_in, self.features),
            )
        y = jnp.dot(x, kernel.astype(self.dtype or x.dtype))
        if self.use_bias:
            if self.bias_init is not None:
                bias = self.param("bias", self.bias_init, (self.features,))
            else:
                bias = self.param(
                    "bias",
                    lambda k, s: _torch_linear_init(k, fan_in, s, jnp.float32),
                    (self.features,),
                )
            y = y + bias.astype(y.dtype)
        return y


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch default 0.25)."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k: jnp.array(self.init_alpha, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over only the valid (mask=True) rows of a padded array.

    Matches torch BatchNorm1d semantics: biased variance for normalization,
    unbiased variance for the running average, momentum 0.1 (torch convention:
    new = (1-m)*old + m*batch). `axis_name` enables cross-replica statistics
    under `shard_map`/`pmap` (replacing DDP's local-stats BN with the better
    synced variant; set to None for per-replica stats).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((d,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((d,)))

        xf = x.astype(jnp.float32)  # batch statistics always in f32
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                m = jnp.ones(x.shape[:-1], dtype=jnp.float32)
            else:
                m = mask.astype(jnp.float32)
            mw = m[..., None]
            cnt = jnp.sum(m)
            sx = jnp.sum(xf * mw, axis=tuple(range(x.ndim - 1)))
            sx2 = jnp.sum(xf * xf * mw, axis=tuple(range(x.ndim - 1)))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                sx = jax.lax.psum(sx, self.axis_name)
                sx2 = jax.lax.psum(sx2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = sx / cnt
            var = jnp.maximum(sx2 / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class _Norm(nn.Module):
    """Dispatch on the reference's Normalization strings."""

    kind: str  # "bn" | "ln" | "None"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = True):
        if self.kind == "bn":
            return MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=mask, use_running_average=use_running_average
            )
        if self.kind == "ln":
            # statistics promote to f32 (flax param dtype); keep the MLP
            # chain in the caller's compute dtype
            return nn.LayerNorm(epsilon=1e-5)(x).astype(x.dtype)
        return x


class MLP(nn.Module):
    """Reference-equivalent MLP (`reference equihgnn/models/layers/mlp.py:6-118`)."""

    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float = 0.5
    normalization: str = "bn"
    input_norm: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        assert self.normalization in ("bn", "ln", "None")
        norm = lambda name: _Norm(self.normalization, self.axis_name, name=name)
        if self.input_norm:
            x = norm("norm_in")(x, mask=mask, use_running_average=deterministic)
        if self.num_layers == 1:
            return TorchLinear(self.out_channels, name="lin_0")(x)
        for i in range(self.num_layers - 1):
            x = TorchLinear(self.hidden_channels, name=f"lin_{i}")(x)
            x = nn.relu(x)
            x = norm(f"norm_{i}")(x, mask=mask, use_running_average=deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return TorchLinear(self.out_channels, name=f"lin_{self.num_layers - 1}")(x)


def mlp_flops(in_channels: int, hidden: int, out: int, num_layers: int,
              num_samples: int) -> int:
    """FLOPs estimate matching the reference's `MLP.flops`
    (`reference equihgnn/models/layers/mlp.py:101-118`)."""
    flops = num_samples * in_channels  # input normalization
    flops += num_samples * in_channels * hidden
    flops += num_samples * hidden  # first relu
    per_layer = num_samples * hidden * hidden + num_samples * hidden
    flops += per_layer * max(num_layers - 2, 0)
    flops += num_samples * out * hidden
    return flops


class PlainMLP(nn.Module):
    """Norm-free variant (`reference equihgnn/models/layers/mlp.py:121-153`)."""

    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers - 1):
            x = TorchLinear(self.hidden_channels, name=f"lin_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return TorchLinear(self.out_channels, name=f"lin_{self.num_layers - 1}")(x)
