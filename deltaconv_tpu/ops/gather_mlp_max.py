"""Fused neighbor-gather + multi-layer MLP + masked max (eval).

The scalar stream of a depth>=2 DeltaConv maxes a per-edge MLP over
the neighborhood (reference /root/reference/deltaconv/nn/deltaconv.py:
50-54 with ``mlp_depth=2`` from train_shapenet.py:79-89). The depth-1
fast paths (ops/gather_max.py one-hot kernels) cannot commute a
multi-layer MLP through the max, so the reference fallback either
materializes a ``[B, N, K, C]`` edge tensor (centralized) or gathers
the MLP OUTPUT at ``C_out`` lanes (non-centralized) — for the
segmentation config's last conv that is a 256-lane one-hot contraction
where the inputs are only 128 wide.

This kernel instead gathers the INPUT features with the one-hot MXU
matmul (``C_in`` lanes), then runs the whole eval-mode MLP on the
gathered block in VMEM:

  e0  = x[idx_k]  (minus the self row when ``centralized``)
  h   = LeakyReLU(bf16(e0 @ W_i) * a_i + b_i)     for layers 0..L-2
  z   = bf16(h @ W_last)                           (sign-pre-folded)
  out = max over valid slots k0..K-1 of z

Eval-mode BatchNorm is the affine ``y*a + b`` with ``a = inv`` and
``b = bias - mean*inv``; the LAST layer's affine + LeakyReLU commute
out of the max by sign-folding (the caller multiplies W_last's columns
by ``sign(inv)`` and finishes ``LeakyReLU((sign*out - mean)*inv +
bias)`` per point — see nn/deltaconv.py's depth-1 fast paths for the
same idiom). Intermediate activations round to bf16 between layers,
matching ``MLP(dtype="bfloat16")`` layer-by-layer.

``skip_slot0=True`` leaves the kNN self slot to the caller (a plain
per-point matmul outside the kernel), saving one one-hot pass per
tile. Forward-only: training routes through the reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_max import _NEG, _pad_to, build_onehot, fit_tile

__all__ = ["gather_mlp_max"]


def _mlp_chain(h0, w_refs, aff_refs, n_layers):
    """The eval-mode MLP chain on a gathered block: f32 accumulate,
    bf16 rounding between layers (parity with MLP(dtype=bf16))."""
    h = h0.astype(jnp.bfloat16)
    for i in range(n_layers - 1):
        y = jnp.dot(h, w_refs[i][...],
                    preferred_element_type=jnp.float32)
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
        a = aff_refs[2 * i][0]
        b = aff_refs[2 * i + 1][0]
        y = y * a + b
        y = jnp.where(y >= 0, y, 0.2 * y)
        h = y.astype(jnp.bfloat16)
    z = jnp.dot(h, w_refs[n_layers - 1][...],
                preferred_element_type=jnp.float32)
    return z.astype(jnp.bfloat16).astype(jnp.float32)


def _kernel(idx_ref, mask_ref, x_ref, *refs, k, n, n_layers,
            centralized, k0, z0_mode=None, affine=False):
    t = idx_ref.shape[1]
    c_in = x_ref.shape[2]
    refs = list(refs)
    w_refs = refs[:n_layers]
    rest = refs[n_layers + 2 * (n_layers - 1):]
    aff_refs = refs[n_layers:n_layers + 2 * (n_layers - 1)]
    z0_ref = rest.pop(0) if z0_mode else None
    epi_ref = rest.pop(0) if affine else None
    out_ref = rest[-1]

    kk_n = k - k0
    onehot = build_onehot(idx_ref, t, n, k, k0)  # [(K-k0)*T, N]
    xg = jnp.dot(onehot, x_ref[0],
                 preferred_element_type=jnp.float32)  # [(K-k0)*T, C_in]
    if centralized:
        t0 = pl.program_id(1) * t
        x_self = x_ref[0, pl.ds(t0, t), :].astype(jnp.float32)
        xg = (xg.reshape(kk_n, t, c_in) - x_self[None]
              ).reshape(kk_n * t, c_in)

    z = _mlp_chain(xg, w_refs, aff_refs, n_layers)  # [(K-k0)*T, C_out]
    c_out = z.shape[-1]
    best = jnp.full((t, c_out), _NEG, jnp.float32)
    for kk in range(k0, k):
        i0 = (kk - k0) * t
        vk = z[i0:i0 + t, :]
        ok = mask_ref[0, :, kk][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok, vk, _NEG))
    if z0_mode:
        # The self slot (kNN slot 0), precomputed by the caller: one
        # broadcast row ("const", the centralized zero edge) or the
        # tile's per-point rows ("rows").
        z0 = (z0_ref[0] if z0_mode == "const"
              else z0_ref[0].astype(jnp.float32))
        ok0 = mask_ref[0, :, 0][:, None] > 0
        best = jnp.maximum(best, jnp.where(ok0, z0, _NEG))
    if affine:
        # Eval epilogue (nn/deltaconv.py DeepMaxMLP): NO bf16 rounding
        # of the max first — the unfused kernel returns f32.
        sign = epi_ref[0:1, :]
        inv = epi_ref[1:2, :]
        mean = epi_ref[2:3, :]
        bias = epi_ref[3:4, :]
        o = (sign * best - mean) * inv + bias
        o = jnp.where(o >= 0, o, 0.2 * o)
        valid = jnp.sum(mask_ref[0], axis=1)[:, None] > 0
        out_ref[0] = jnp.where(valid, o, 0.0).astype(out_ref.dtype)
    else:
        out_ref[0] = best


def _reference(x, ws, affines, idx, mask, centralized, k0):
    """XLA path (CPU backends + test anchor): materializes the edges."""
    xg = jax.vmap(lambda a, i: a[i])(x, idx)  # [B, N, K, C_in]
    if centralized:
        xg = xg - x[..., :, None, :]
    h = xg.astype(jnp.bfloat16)
    n_layers = len(ws)
    for i in range(n_layers - 1):
        y = jnp.dot(h, ws[i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
        a, b = affines[i]
        y = y * a + b
        y = jnp.where(y >= 0, y, 0.2 * y)
        h = y.astype(jnp.bfloat16)
    z = jnp.dot(h, ws[-1].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    z = z.astype(jnp.bfloat16).astype(jnp.float32)
    slot_ok = mask & (jnp.arange(idx.shape[-1]) >= k0)
    return jnp.max(jnp.where(slot_ok[..., None], z, _NEG), axis=-2)


def gather_mlp_max(x, ws, affines, idx, mask, centralized=False,
                   skip_slot0=False, tile=128, interpret=False,
                   z0=None, epilogue=None):
    """``x [B, N, C_in]``: masked max over neighbor slots of the
    eval-mode MLP applied per edge (see module docstring).

    Args:
      x: input features (bf16 or f32; gathered as bf16 — callers run
        this in the mixed-precision eval path).
      ws: per-layer weight matrices ``[C_i, C_{i+1}]``; the LAST one
        sign-pre-folded by the caller.
      affines: per-INTERMEDIATE-layer ``(a, b)`` f32 pairs — the
        eval BatchNorm affine applied between layers.
      idx, mask: ``[B, N, K]`` neighbor lists + validity.
      centralized: subtract the tile's own row from each gathered row
        before layer 0 (the ``x_j - x_i`` edge variant).
      skip_slot0: exclude slot 0 (the kNN self-loop) — the caller
        contributes it with a per-point matmul.
      z0: optional precomputed self-slot values merged in-kernel
        (requires ``skip_slot0``): ``[C_out]`` f32 (one broadcast row,
        the centralized zero edge) or ``[B, N, C_out]`` per-point.
      epilogue: optional ``(sign, inv, mean, bias)`` — the eval
        BN/LeakyReLU epilogue runs in-kernel and the result is the
        final bf16 activation with all-masked rows zeroed (bit-exact
        vs the XLA epilogue; requires ``z0``).

    Returns ``[B, N, C_out]`` f32 (or bf16 with ``epilogue``); rows
    with no valid covered slot return ``-3e38`` (callers mask or max
    them with the self slot) or 0 with ``epilogue``.
    """
    b, n, c_in = x.shape
    k = idx.shape[-1]
    k0 = 1 if skip_slot0 else 0
    n_layers = len(ws)
    assert len(affines) == n_layers - 1
    assert (z0 is None) or skip_slot0
    assert (epilogue is None) or z0 is not None
    if not (jax.default_backend() == "tpu" or interpret):
        assert z0 is None and epilogue is None
        return _reference(x, ws, affines, idx, mask, centralized, k0)

    c_out = ws[-1].shape[-1]
    c_mid = max(w.shape[-1] for w in ws)
    # onehot [(K-k0)*T, N] bf16 + gathered f32+bf16 [.., C_in] +
    # per-layer activations [.., C_mid] f32+bf16 + z [.., C_out].
    tile = fit_tile(tile, (k - k0) * (2 * n + 6 * c_in + 6 * c_mid
                                      + 4 * c_out),
                    budget=10 * 2**20)
    idx_p = _pad_to(idx.astype(jnp.int32), tile, 1)
    mask_p = _pad_to(mask.astype(jnp.int32), tile, 1)
    n_pad = idx_p.shape[1]
    if centralized and n_pad != n:
        # Self-row reads address table rows [t0, t0+tile) — pad the
        # table so the last tile's reads stay in bounds.
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    n_tab = x.shape[1]

    spec_t = pl.BlockSpec((1, tile, k), lambda ib, it: (ib, it, 0),
                          memory_space=pltpu.VMEM)
    w_args, w_specs = [], []
    for w in ws:
        w_args.append(w.astype(jnp.bfloat16))
        w_specs.append(pl.BlockSpec(w.shape, lambda ib, it: (0, 0),
                                    memory_space=pltpu.VMEM))
    for a, bb in affines:
        for vec in (a, bb):
            w_args.append(vec.astype(jnp.float32)[None, :])
            w_specs.append(pl.BlockSpec((1, vec.shape[-1]),
                                        lambda ib, it: (0, 0),
                                        memory_space=pltpu.VMEM))

    z0_mode = None
    if z0 is not None:
        if z0.ndim == 1:
            z0_mode = "const"
            w_args.append(z0.astype(jnp.float32)[None, :])
            w_specs.append(pl.BlockSpec((1, c_out),
                                        lambda ib, it: (0, 0),
                                        memory_space=pltpu.VMEM))
        else:
            z0_mode = "rows"
            z0p = _pad_to(z0.astype(jnp.bfloat16), tile, 1)
            w_args.append(z0p)
            w_specs.append(pl.BlockSpec((1, tile, c_out),
                                        lambda ib, it: (ib, it, 0),
                                        memory_space=pltpu.VMEM))
    if epilogue is not None:
        w_args.append(jnp.stack([a.astype(jnp.float32)
                                 for a in epilogue]))
        w_specs.append(pl.BlockSpec((4, c_out), lambda ib, it: (0, 0),
                                    memory_space=pltpu.VMEM))
    out_dt = jnp.float32 if epilogue is None else jnp.bfloat16

    # The one-hot spans the (possibly padded) table length: padded
    # columns can never match an index (< n), so no masking is needed.
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, n=n_tab, n_layers=n_layers,
                          centralized=centralized, k0=k0,
                          z0_mode=z0_mode, affine=epilogue is not None),
        grid=(b, n_pad // tile),
        in_specs=[
            spec_t, spec_t,
            pl.BlockSpec((1, n_tab, c_in), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, tile, c_out),
                               lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_out), out_dt),
        interpret=interpret,
    )(idx_p, mask_p, x.astype(jnp.bfloat16), *w_args)
    return out[:, :n]
