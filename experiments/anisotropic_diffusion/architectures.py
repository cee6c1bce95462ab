"""Image-domain ResNet reimplementations of seven convolution operators.

JAX/flax re-design of the reference study
(/root/reference/experiments/anisotropic_diffusion/architectures.py):
each network is a residual stack of one operator family, trained to
mimic Perona-Malik anisotropic diffusion — the paper's Figure 2
demonstration that DeltaConv's gradient/divergence coupling can learn
anisotropic behavior that isotropic operators cannot.

Families: CNN (3x3 convs), DeltaConv (gradient -> vector MLP + norm
nonlinearity -> divergence), DiffusionNet-style (isotropic diffusion +
gradient dot features), EdgeConv, PointNet++, GCN (all on the 3x3 pixel
neighborhood). Images are ``[B, H, W, C]``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as lnn
import jax
import jax.numpy as jnp

from diffusion import laplacian, spatial_gradient
from deltaconv_tpu.nn.init import torch_linear_kernel


def _dense(width, name):
    """Bias-free Dense with the reference's torch init: the 16-layer
    unnormalized ResNets diverge under flax's 3x-variance
    lecun_normal default (measured: DiffusionNet final L1 ~1e7)."""
    return lnn.Dense(width, use_bias=False,
                     kernel_init=torch_linear_kernel, name=name)

__all__ = ["ConvNet", "DeltaNet", "DiffusionNet", "EdgeNet", "PointNet",
           "GCN", "ALL_NETS"]


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _unfold3x3(x):
    """All 9 shifted copies of the image: ``[B,H,W,C] -> [B,H,W,9,C]``
    (zero padding), replacing torch's unfold."""
    pads = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
            (1, -1), (1, 0), (1, 1)]
    outs = []
    for dy, dx in pads:
        shifted = jnp.roll(x, (dy, dx), axis=(1, 2))
        # Zero out wrapped borders.
        if dy == -1:
            shifted = shifted.at[:, -1].set(0)
        elif dy == 1:
            shifted = shifted.at[:, 0].set(0)
        if dx == -1:
            shifted = shifted.at[:, :, -1].set(0)
        elif dx == 1:
            shifted = shifted.at[:, :, 0].set(0)
        outs.append(shifted)
    return jnp.stack(outs, axis=-2)


class _ResStack(lnn.Module):
    """Shared residual scaffolding: per-layer operator + 1x1 residual
    projection + LeakyReLU(0.2)."""

    num_layers: int = 8
    out_channels: int = 32
    in_channels: int = 1

    def widths(self):
        ws = [self.out_channels] * self.num_layers
        ws[-1] = self.in_channels
        return ws

    def residual(self, x, width, i):
        if x.shape[-1] != width:
            return _dense(width, f"res{i}")(x)
        return x


class ConvNet(_ResStack):
    """Plain 3x3 image convolutions (reference architectures.py:10-36)."""

    @staticmethod
    def net_name():
        return "CNN"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            h = lnn.Conv(w, (3, 3), use_bias=False, name=f"conv{i}")(x)
            x = _lrelu(r + h)
        return x


class DeltaNet(_ResStack):
    """Simplified DeltaConv: grad -> per-channel vector MLP + norm
    nonlinearity -> div (reference architectures.py:39-90)."""

    @staticmethod
    def net_name():
        return "DeltaConv"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            gx, gy = spatial_gradient(x)
            v = jnp.stack([gx, gy], axis=-2)  # [B,H,W,2,C]
            v = _dense(w, f"vconv{i}")(v)
            # Norm nonlinearity with small learned bias.
            bias = self.param(
                f"vbias{i}",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-1e-4, maxval=1e-4
                ),
                (w,),
            )
            # Gradient-safe norm: image gradients are exactly zero in
            # constant regions and jnp.linalg.norm backprops NaN there.
            sq = jnp.sum(v * v, axis=-2, keepdims=True)
            mag = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)),
                            0.0)
            scaled = jax.nn.relu(mag + bias)
            v = v * (scaled / jnp.clip(mag, 1e-5))
            div = spatial_gradient(v[..., 0, :])[0] + \
                spatial_gradient(v[..., 1, :])[1]
            h = _dense(w, f"conv{i}")(
                jnp.concatenate([x, div], axis=-1)
            )
            x = _lrelu(r + h)
        return x


class DiffusionNet(_ResStack):
    """Isotropic diffusion + gradient-dot features (reference
    architectures.py:92-141)."""

    @staticmethod
    def net_name():
        return "DiffusionNet"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            gx, gy = spatial_gradient(x)
            v = jnp.stack([gx, gy], axis=-2)
            v_mlp = _dense(x.shape[-1], f"vconv{i}")(v)
            scalar_v = jnp.tanh(jnp.sum(v * v_mlp, axis=-2))
            x_lapl = laplacian(x)
            h = _dense(w, f"conv{i}")(
                jnp.concatenate([x, -x_lapl, scalar_v], axis=-1)
            )
            x = _lrelu(r + h)
        return x


class EdgeNet(_ResStack):
    """EdgeConv on the pixel grid: MLP([x_i, x_j - x_i]) + max
    (reference architectures.py:144-185)."""

    @staticmethod
    def net_name():
        return "EdgeConv"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            nbr = _unfold3x3(x)  # [B,H,W,9,C]
            center = nbr[..., 4:5, :]
            edge = jnp.concatenate(
                [jnp.broadcast_to(center, nbr.shape), nbr - center], axis=-1
            )
            h = _lrelu(
                _dense(w, f"conv{i}")(edge)
            ).max(axis=-2)
            x = _lrelu(r + h)
        return x


class PointNet(_ResStack):
    """PointNet++ on the pixel grid: MLP(x_j) + max (reference
    architectures.py:188-226)."""

    @staticmethod
    def net_name():
        return "PointNet++"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            nbr = _unfold3x3(x)
            h = _lrelu(
                _dense(w, f"conv{i}")(nbr)
            ).max(axis=-2)
            x = _lrelu(r + h)
        return x


class GCN(_ResStack):
    """GCN on the pixel grid: mean of MLP(x_j) (reference
    architectures.py:229-269)."""

    @staticmethod
    def net_name():
        return "GCN"

    @lnn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths()):
            r = self.residual(x, w, i)
            nbr = _unfold3x3(x)
            h = _dense(w, f"conv{i}")(nbr).mean(
                axis=-2
            )
            x = _lrelu(r + h)
        return x


ALL_NETS = [DeltaNet, EdgeNet, PointNet, GCN, DiffusionNet, ConvNet]
