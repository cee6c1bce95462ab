"""Pallas kernel tests.

The CPU suite exercises the reference paths these kernels must match;
the kernels themselves execute only on TPU, where the `tpu` marker
variants compare them against the reference implementations (run
`pytest -m tpu` on a TPU host; the driver's bench run also covers them
end-to-end).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.ops.gather_max import (
    _reference_fwd,
    _win_to_idx,
    gather_max,
    masked_nbr_max,
)

ON_TPU = jax.default_backend() == "tpu"


def _inputs(rng, b=4, n=200, k=10, c=32):
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = np.ones((b, n, k), bool)
    mask[:, :, k - 2:] = False
    return h, idx, jnp.asarray(mask)


def test_gather_max_reference_path(rng):
    """On any backend, gather_max matches a numpy gather+max."""
    h, idx, mask = _inputs(rng)
    out = np.asarray(jax.jit(gather_max)(h, idx, mask))
    hn, idxn, maskn = map(np.asarray, (h, idx, mask))
    want = np.where(maskn[..., None], hn[
        np.arange(hn.shape[0])[:, None, None], idxn], -3.0e38).max(axis=2)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_gather_max_gradient_single_winner(rng):
    h, idx, mask = _inputs(rng)

    def loss(h):
        return jnp.sum(gather_max(h, idx, mask) ** 2)

    g = np.asarray(jax.jit(jax.grad(loss))(h))
    assert np.all(np.isfinite(g))

    # Gradient lands exactly on winner rows.
    out, winner = _reference_fwd(h, idx, mask)
    win_idx = np.asarray(_win_to_idx(idx, winner))
    b, n, c = g.shape
    expected = np.zeros_like(g)
    go = 2 * np.asarray(out)
    for bi in range(b):
        for ni in range(n):
            for ci in range(c):
                expected[bi, win_idx[bi, ni, ci], ci] += go[bi, ni, ci]
    np.testing.assert_allclose(g, expected, atol=1e-4)


def test_masked_nbr_max_unbatched(rng):
    h, idx, mask = _inputs(rng, b=1)
    out_b = masked_nbr_max(h, idx, mask)
    out_u = masked_nbr_max(h[0], idx[0], mask[0])
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_u))


@pytest.mark.parametrize("c", [64, 256])
def test_gather_max_pallas_exact_under_jit(rng, c):
    """The hi/lo split must survive XLA's excess-precision pass: under
    jit, f32(bf16(h)) used to cancel to h, folding lo to zero and
    degrading gathered values to bf16 (2e-3 rel error at C >= 128).
    Guarded by lax.optimization_barrier; exercised here in interpret
    mode so the surrounding XLA jit graph is the real one."""
    from deltaconv_tpu.ops.gather_max import _pallas_fwd

    b, n, k = 2, 256, 10
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), bool)

    out, _ = jax.jit(
        lambda h, i, m: _pallas_fwd(h, i, m, tile=128, interpret=True)
    )(h, idx, mask)
    hn, idxn = np.asarray(h), np.asarray(idx)
    want = hn[np.arange(b)[:, None, None], idxn].max(axis=2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_densify_pallas_matches_xla(rng):
    """Interpret-mode Pallas dense assembly == the XLA one-hot einsum
    (values AND gradients w.r.t. the coefficients)."""
    from deltaconv_tpu.geometry import dense as D
    from deltaconv_tpu.geometry.grad_div import GradDiv

    b, n, k = 2, 96, 8
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), bool)
    gc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    dc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    gd = GradDiv(nbr_idx=idx, nbr_mask=mask, grad_coef=gc, div_coef=dc)

    ref = D.densify(gd)  # XLA path on CPU
    fast = D.densify(gd, interpret=True)
    np.testing.assert_allclose(np.asarray(fast.w_grad),
                               np.asarray(ref.w_grad), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast.w_div),
                               np.asarray(ref.w_div), atol=1e-6)

    def loss(gc, dc, interpret):
        g = GradDiv(nbr_idx=idx, nbr_mask=mask, grad_coef=gc, div_coef=dc)
        d = D.densify(g, interpret=interpret)
        return jnp.sum(d.w_grad ** 2) + jnp.sum(jnp.sin(d.w_div))

    g_ref = jax.grad(loss, argnums=(0, 1))(gc, dc, False)
    g_fast = jax.grad(loss, argnums=(0, 1))(gc, dc, True)
    for a, bb in zip(jax.tree_util.tree_leaves(g_fast),
                     jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_densify_pallas_matches_numpy_tpu(rng):
    """Kernel output vs a NUMPY-assembled dense matrix (an on-TPU XLA
    einsum reference would itself round through single-pass bf16)."""
    from deltaconv_tpu.ops.densify_op import densify_coefs

    b, n, k = 2, 256, 12
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    gc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    dc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))

    wg, wd = jax.jit(
        lambda i, g, d: densify_coefs(i, g, d, "float32", 128)
    )(idx, gc, dc)

    want = np.zeros((b, 2, n, n), np.float32)
    idxn, gcn = np.asarray(idx), np.asarray(gc)
    for bi in range(b):
        for ni in range(n):
            for kk in range(k):
                for d in range(2):
                    want[bi, d, ni, idxn[bi, ni, kk]] += gcn[bi, ni, kk, d]
    np.testing.assert_allclose(np.asarray(wg), want, atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_gather_backwards_exact_on_tpu(rng):
    """The Pallas VJP kernels (gather_rows/gather_sum transposed
    matmuls) must deliver exact f32 cotangents on real TPU. The hi/lo
    cotangent split is built OUTSIDE the kernels behind an
    optimization_barrier (ops/gather_max.py split_hilo) — the compiler
    cancels an in-kernel ``g - f32(bf16(g))`` to zero, silently
    degrading the backward to single-bf16; this test red-lines that
    regression. Compares against numpy."""
    from deltaconv_tpu.ops.gather_rows import gather_rows
    from deltaconv_tpu.ops.gather_sum import gather_sum

    b, n, k, c = 2, 256, 10, 16
    table = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), bool)
    ct = jnp.asarray(rng.random((b, c, k, n)).astype(np.float32))

    def loss_rows(t):
        return jnp.sum(gather_rows(t, idx) * ct)

    g = np.asarray(jax.jit(jax.grad(loss_rows))(table))
    want = np.zeros((b, n, c), np.float32)
    idxn, ctn = np.asarray(idx), np.asarray(ct, np.float64)
    acc = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for ni in range(n):
            for kk in range(k):
                acc[bi, idxn[bi, ni, kk]] += ctn[bi, :, kk, ni]
    want = acc.astype(np.float32)
    np.testing.assert_allclose(g, want, atol=1e-4, rtol=1e-5)

    ct2 = jnp.asarray(rng.random((b, n, c)).astype(np.float32))

    def loss_sum(t):
        return jnp.sum(gather_sum(t, idx, mask) * ct2)

    g2 = np.asarray(jax.jit(jax.grad(loss_sum))(table))
    acc2 = np.zeros((b, n, c), np.float64)
    ct2n = np.asarray(ct2, np.float64)
    for bi in range(b):
        for ni in range(n):
            for kk in range(k):
                acc2[bi, idxn[bi, ni, kk]] += ct2n[bi, ni]
    np.testing.assert_allclose(g2, acc2.astype(np.float32),
                               atol=1e-4, rtol=1e-5)

    # gather_max / gather_minmax backward: single-winner routing via
    # the transposed one-hot matmul must match the numpy scatter.
    from deltaconv_tpu.ops.gather_max import gather_max, gather_minmax

    hn = np.asarray(table)
    win = hn[np.arange(b)[:, None, None], idxn]  # [B, N, K, C]
    wmax = win.argmax(axis=2)
    wmin = win.argmin(axis=2)

    def loss_max(t):
        return jnp.sum(gather_max(t, idx, mask) * ct2)

    gmx = np.asarray(jax.jit(jax.grad(loss_max))(table))
    accm = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for ni in range(n):
            for ci in range(c):
                accm[bi, idxn[bi, ni, wmax[bi, ni, ci]], ci] += \
                    ct2n[bi, ni, ci]
    np.testing.assert_allclose(gmx, accm.astype(np.float32),
                               atol=1e-4, rtol=1e-5)

    def loss_minmax(t):
        mx, mn = gather_minmax(t, idx, mask)
        return jnp.sum(mx * ct2) - 2.0 * jnp.sum(mn * ct2)

    gmm = np.asarray(jax.jit(jax.grad(loss_minmax))(table))
    accmm = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for ni in range(n):
            for ci in range(c):
                accmm[bi, idxn[bi, ni, wmax[bi, ni, ci]], ci] += \
                    ct2n[bi, ni, ci]
                accmm[bi, idxn[bi, ni, wmin[bi, ni, ci]], ci] -= \
                    2.0 * ct2n[bi, ni, ci]
    np.testing.assert_allclose(gmm, accmm.astype(np.float32),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_gather_max_bf16_cotangent_backward_exact_tpu(rng):
    """bf16 cotangents take the single half-width backward pass (no
    hi/lo split — lo would be identically 0); routing must still be
    EXACT: every cotangent value is bf16-representable, so the scatter
    result is a sum of exact values."""
    from deltaconv_tpu.ops.gather_max import gather_max

    b, n, k, c = 2, 256, 10, 16
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), bool)
    ct = jnp.asarray(rng.random((b, n, c)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def loss(hh):
        return jnp.sum(gather_max(hh, idx, mask).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    g = np.asarray(jax.jit(jax.grad(loss))(h).astype(jnp.float32))
    hn = np.asarray(h.astype(jnp.float32))
    idxn = np.asarray(idx)
    win = hn[np.arange(b)[:, None, None], idxn]
    wmax = win.argmax(axis=2)
    ctn = np.asarray(ct.astype(jnp.float32), np.float64)
    acc = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for ni in range(n):
            for ci in range(c):
                acc[bi, idxn[bi, ni, wmax[bi, ni, ci]], ci] += \
                    ctn[bi, ni, ci]
    # dh returns in h's dtype (bf16): compare after the same rounding.
    want = acc.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(g, np.asarray(want), atol=2e-2,
                               rtol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_gather_max_self_slot0_vjp_tpu(rng):
    """gather_max's self_slot0 VJP path (direct self-row read forward,
    direct-addressed slot-0 routing backward) matches the slot-0
    one-hot path: identical forward values and gradients equal up to
    f32 re-association of the per-row adds."""
    from deltaconv_tpu.ops.gather_max import gather_max

    b, n, k, c = 2, 256, 10, 16
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    base = np.tile(np.arange(n, dtype=np.int32)[None, :, None],
                   (b, 1, k))
    base[..., 1:] = rng.integers(0, n, (b, n, k - 1))
    idx = jnp.asarray(base)
    mask = jnp.ones((b, n, k), bool)
    ct = jnp.asarray(rng.random((b, n, c)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def loss(hh, slot0):
        out = gather_max(hh, idx, mask, slot0)
        return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))

    f_ref = jax.jit(lambda hh: (loss(hh, False),
                                jax.grad(loss)(hh, False)))
    f_s0 = jax.jit(lambda hh: (loss(hh, True),
                               jax.grad(loss)(hh, True)))
    l_ref, g_ref = f_ref(h)
    l_s0, g_s0 = f_s0(h)
    np.testing.assert_array_equal(np.asarray(l_ref, np.float32),
                                  np.asarray(l_s0, np.float32))
    np.testing.assert_allclose(np.asarray(g_s0, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
@pytest.mark.parametrize("c", [64, 256])
def test_gather_max_pallas_exact_under_jit_tpu(rng, c):
    from deltaconv_tpu.ops.gather_max import _pallas_fwd

    b, n, k = 2, 512, 12
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.ones((b, n, k), bool)
    out, _ = jax.jit(lambda h, i, m: _pallas_fwd(h, i, m))(h, idx, mask)
    hn, idxn = np.asarray(h), np.asarray(idx)
    want = hn[np.arange(b)[:, None, None], idxn].max(axis=2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_knn_topk_interpret_exact(rng):
    """Pallas fused kNN == exact numpy top-k (set equality; slot 0 is
    the self-loop; ties break to the lowest index)."""
    from deltaconv_tpu.ops.knn_topk import knn_topk

    b, n, k = 2, 256, 12
    pos = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    idx = np.asarray(knn_topk(pos, k, interpret=True))

    pn = np.asarray(pos, np.float64)
    d2 = ((pn[:, :, None, :] - pn[:, None, :, :]) ** 2).sum(-1)
    for bi in range(b):
        np.fill_diagonal(d2[bi], -1.0)
    ref = np.argsort(d2, axis=-1, kind="stable")[:, :, :k]
    assert np.all(idx[:, :, 0] == np.arange(n)[None, :])
    for bi in range(b):
        for ni in range(n):
            assert set(ref[bi, ni]) == set(idx[bi, ni])


def test_densify_bf16_or_packing_matches_f32(rng):
    """The bf16 OR-packed assembly kernel == the f32 kernel's output
    rounded to bf16 (placement is exact; packing must not corrupt
    signs/zeros, including -0.0-coefficient padded slots)."""
    from deltaconv_tpu.ops.densify_op import densify_coefs

    b, n, k = 2, 128, 9
    # Distinct columns per row with self in slot 0 (the kernel
    # contract: kNN neighbors are unique; only padded slots repeat,
    # with zero coefficients): self + distinct nonzero offsets mod n.
    off = np.stack([
        np.stack([np.concatenate([[0], rng.permutation(n - 1)[:k - 1] + 1])
                  for _ in range(n)])
        for _ in range(b)
    ])
    idx = ((np.arange(n)[None, :, None] + off) % n).astype(np.int32)
    idx[:, 17, -2:] = 17  # padded slots clamped to self...
    gc = rng.standard_normal((b, n, k, 2)).astype(np.float32)
    dc = rng.standard_normal((b, n, k, 2)).astype(np.float32)
    gc[:, 17, -2:] = -0.0  # ...with negative-zero coefficients
    dc[:, 17, -2:] = -0.0
    idx, gc, dc = jnp.asarray(idx), jnp.asarray(gc), jnp.asarray(dc)

    wg16, wd16 = jax.jit(lambda i, g, d: densify_coefs(
        i, g, d, "bfloat16", 128, True))(idx, gc, dc)
    wg32, wd32 = jax.jit(lambda i, g, d: densify_coefs(
        i, g, d, "float32", 128, True))(idx, gc, dc)
    np.testing.assert_array_equal(
        np.asarray(wg16), np.asarray(wg32.astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(wd16), np.asarray(wd32.astype(jnp.bfloat16)))


@pytest.mark.parametrize("tile,n", [(128, 192), (64, 192), (64, 193)])
def test_gather_rows_component_major_interpret(rng, tile, n, monkeypatch):
    """gather_rows returns [B, C, K, N] with out[b, c, kk, i] ==
    table[b, idx[b, i, kk], c] to two-term-bf16 precision (~2^-16
    relative). tile=64 + a shrunk block width forces the column-
    blocked large-N kernel variant (fwd AND bwd); n=193 (prime)
    exercises the ceil-division blocking with a padded final block."""
    import deltaconv_tpu.ops.gather_rows as GR
    from deltaconv_tpu.ops.gather_rows import gather_rows

    if tile < 128:
        monkeypatch.setattr(GR, "_MAX_ONEHOT_COLS", 64)

    b, k, c = 2, 9, 11
    table = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))

    out = jax.jit(lambda t, i: gather_rows(t, i, tile, True))(table, idx)
    assert out.shape == (b, c, k, n)
    tn, idxn = np.asarray(table), np.asarray(idx)
    want = tn[np.arange(b)[:, None, None], idxn]  # [B, N, K, C]
    want = np.transpose(want, (0, 3, 2, 1))
    np.testing.assert_allclose(np.asarray(out), want, rtol=3e-5,
                               atol=1e-5)

    # gradient through the matching backward variant
    ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    g = jax.jit(jax.grad(lambda t: jnp.sum(
        gather_rows(t, idx, tile, True) * ct)))(table)
    tn, idxn, ctn = (np.asarray(table), np.asarray(idx),
                     np.asarray(ct, np.float64))
    acc = np.zeros((b, n, c), np.float64)
    for bi in range(b):
        for ni in range(n):
            for kk in range(k):
                acc[bi, idxn[bi, ni, kk]] += ctn[bi, :, kk, ni]
    np.testing.assert_allclose(np.asarray(g), acc.astype(np.float32),
                               atol=1e-4, rtol=1e-4)


def test_gather_sum_streaming_path_interpret(rng, monkeypatch):
    """The O(N*K) streaming _fwd_kernel/_bwd_kernel pair (engaged when
    the [B, N, N] adjacency would bust the byte budget) must match the
    reference sum and scatter-add gradient. _DENSE_ADJ_MAX_BYTES is
    patched to 0 so the streaming kernels run even at tiny N (the
    dense path otherwise swallows every test-sized cloud)."""
    import deltaconv_tpu.ops.gather_sum as GS
    from deltaconv_tpu.ops.gather_sum import gather_sum

    monkeypatch.setattr(GS, "_DENSE_ADJ_MAX_BYTES", 0)

    b, n, k, c = 2, 192, 7, 16
    h = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = np.ones((b, n, k), bool)
    mask[:, :, -2:] = False
    mask = jnp.asarray(mask)

    out = jax.jit(lambda a: gather_sum(a, idx, mask, 64, True))(h)
    hn, idxn, maskn = map(np.asarray, (h, idx, mask))
    want = np.where(maskn[..., None],
                    hn[np.arange(b)[:, None, None], idxn], 0.0).sum(2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5,
                               rtol=1e-5)

    ct = jnp.asarray(rng.random((b, n, c)).astype(np.float32))
    g = jax.jit(jax.grad(lambda a: jnp.sum(
        gather_sum(a, idx, mask, 64, True) * ct)))(h)
    acc = np.zeros((b, n, c), np.float64)
    ctn = np.asarray(ct, np.float64)
    for bi in range(b):
        for ni in range(n):
            for kk in range(k):
                if maskn[bi, ni, kk]:
                    acc[bi, idxn[bi, ni, kk]] += ctn[bi, ni]
    np.testing.assert_allclose(np.asarray(g), acc.astype(np.float32),
                               atol=1e-4, rtol=1e-4)


def test_gather_sum_dense_cutoff_keys_on_bytes():
    """The dense-adjacency fast path is gated on TOTAL residual bytes
    (B*N*N*2), not N alone: B=16 x N=4096 (~536 MB live from forward
    to backward) must take the streaming path while the two headline
    configs stay dense."""
    from deltaconv_tpu.ops.gather_sum import _dense_path_ok

    assert _dense_path_ok(32, 1024)      # headline cls: 64 MB
    assert _dense_path_ok(16, 2048)      # headline seg: 128 MB
    assert not _dense_path_ok(16, 4096)  # 536 MB residual
    assert not _dense_path_ok(1, 16384)


def test_gather_matmul_minmax_interpret(rng):
    """Fused gather-then-matmul min/max == numpy gather of (x @ w)."""
    from deltaconv_tpu.ops.gather_max import gather_matmul_minmax

    b, n, k, ci, co = 2, 128, 7, 16, 24
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ci, co)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)

    mx, mn = jax.jit(lambda x, w, i, m: gather_matmul_minmax(
        x, w, i, m, interpret=True))(x, w, idx, mask)

    y = np.asarray(jnp.einsum(
        "bnc,cd->bnd", x, w, preferred_element_type=jnp.float32))
    yg = y[np.arange(b)[:, None, None], np.asarray(idx)]  # [B,N,K,Co]
    mk = np.asarray(mask)[..., None]
    want_mx = np.where(mk, yg, -3e38).max(axis=2)
    want_mn = np.where(mk, yg, 3e38).min(axis=2)
    np.testing.assert_allclose(np.asarray(mx), want_mx, rtol=1e-2,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(mn), want_mn, rtol=1e-2,
                               atol=1e-2)


def test_gather_matmul_max_interpret(rng):
    """Single-chain fused gather-then-matmul max (the sign-folded eval
    path) == numpy gather of (x @ w), incl. the self-slot shortcut."""
    from deltaconv_tpu.ops.gather_max import gather_matmul_max

    b, n, k, ci, co = 2, 128, 7, 16, 24
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ci, co)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)

    for slot0 in (False, True):
        mx = jax.jit(lambda x, w, i, m: gather_matmul_max(
            x, w, i, m, interpret=True, self_slot0=slot0))(
            x, w, idx, mask)
        y = np.asarray(jnp.einsum(
            "bnc,cd->bnd", x, w, preferred_element_type=jnp.float32))
        yg = y[np.arange(b)[:, None, None], np.asarray(idx)]
        mk = np.asarray(mask)[..., None]
        want = np.where(mk, yg, -3e38).max(axis=2)
        np.testing.assert_allclose(np.asarray(mx), want, rtol=1e-2,
                                   atol=1e-2)


def _affine_vectors(rng, c):
    """BN eval affine with a mix of positive and negative slopes."""
    inv = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    sign = jnp.where(inv >= 0, 1.0, -1.0)
    mean = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return sign, inv, mean, bias


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def test_gather_max_affine_interpret(rng):
    """The fused BN/LeakyReLU epilogue (EdgeMaxMLP eval form with the
    self-row subtraction, and the plain form) is BIT-exact vs the
    unfused kernel + the XLA epilogue it replaces
    (nn/deltaconv.py:EdgeMaxMLP). CPU-pinned: the interpret
    surrogate's bf16 round-trips are elided by the TPU XLA pipeline
    (see test_gather_mlp_max_interpret)."""
    from deltaconv_tpu.ops.gather_max import gather_max_affine

    cpu = jax.devices("cpu")[0]
    b, n, k, c = 2, 100, 7, 24  # n % tile != 0: slot-0 self gather
    h = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)
    mask = mask.at[0, 3].set(False)  # an all-masked row
    sign, inv, mean, bias = _affine_vectors(rng, c)
    any_valid = jnp.any(mask, -1)[..., None]

    with jax.default_device(cpu):
        # EdgeMaxMLP form: subtract the self row inside the sign fold.
        # Reference max inlined (masked_nbr_max backend-dispatches to
        # the non-interpret kernel in TPU mode): masked max over
        # gathered bf16 rows, all-masked rows -> 0, bf16 output.
        gathered = jax.vmap(lambda a, i: a[i])(h, idx)
        mx32 = jnp.max(jnp.where(mask[..., None],
                                 gathered.astype(jnp.float32), -3.0e38),
                       axis=-2)
        mxp = jnp.where(any_valid, mx32, 0.0).astype(jnp.bfloat16)
        h_star = sign * (mxp.astype(jnp.float32)
                         - h.astype(jnp.float32))
        ref = _lrelu((h_star - mean) * inv + bias)
        ref = jnp.where(any_valid, ref, 0.0).astype(jnp.bfloat16)
        got = jax.jit(lambda h: gather_max_affine(
            h, idx, mask, (sign, inv, mean, bias), sub_self=True,
            interpret=True))(h)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

        # Plain form (no self subtraction).
        y_star = sign * mxp.astype(jnp.float32)
        ref2 = _lrelu((y_star - mean) * inv + bias)
        ref2 = jnp.where(any_valid, ref2, 0.0).astype(jnp.bfloat16)
        got2 = jax.jit(lambda h: gather_max_affine(
            h, idx, mask, (sign, inv, mean, bias), sub_self=False,
            interpret=True))(h)
        np.testing.assert_array_equal(np.asarray(got2, np.float32),
                                      np.asarray(ref2, np.float32))


def test_gather_matmul_max_affine_interpret(rng):
    """gather_matmul_max's fused epilogue (PointMaxMLP eval form) is
    BIT-exact vs the same kernel without it + the XLA epilogue.
    CPU-pinned: the interpret surrogate's bf16 round-trips are elided
    by the TPU XLA pipeline (see test_gather_mlp_max_interpret)."""
    from deltaconv_tpu.ops.gather_max import gather_matmul_max

    cpu = jax.devices("cpu")[0]
    b, n, k, ci, co = 2, 128, 7, 16, 24
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ci, co)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)
    mask = mask.at[1, 5].set(False)
    sign, inv, mean, bias = _affine_vectors(rng, co)
    wp = (w.astype(jnp.float32) * sign[None, :]).astype(jnp.bfloat16)

    with jax.default_device(cpu):
        mx = gather_matmul_max(x, wp, idx, mask, self_slot0=True,
                               interpret=True)
        y_star = sign * mx.astype(jnp.float32)
        ref = _lrelu((y_star - mean) * inv + bias)
        ref = jnp.where(jnp.any(mask, -1)[..., None], ref,
                        0.0).astype(jnp.bfloat16)
        got = jax.jit(lambda x: gather_matmul_max(
            x, wp, idx, mask, self_slot0=True,
            affine=(sign, inv, mean, bias), interpret=True))(x)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))


def test_gather_minmax_self_slot0_interpret(rng):
    """The self-slot shortcut (read own rows instead of comparing
    slot 0) is exact when idx[..., 0] == arange(N)."""
    from deltaconv_tpu.ops.gather_max import gather_minmax

    b, n, k, c = 2, 256, 9, 16
    h = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)

    mx, mn = jax.jit(lambda h: gather_minmax(h, idx, mask, True,
                                             True))(h)
    g = np.asarray(h.astype(jnp.float32))[
        np.arange(b)[:, None, None], np.asarray(idx)]
    mk = np.asarray(mask)[..., None]
    np.testing.assert_array_equal(
        np.asarray(mx.astype(jnp.float32)),
        np.where(mk, g, -3e38).max(axis=2).astype(
            np.float32).astype(jnp.bfloat16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(mn.astype(jnp.float32)),
        np.where(mk, g, 3e38).min(axis=2).astype(
            np.float32).astype(jnp.bfloat16).astype(np.float32))


def test_knn_topk_mean_dist_interpret(rng):
    """return_mean_dist recovers the exact mean neighbor distance
    (self counted as 0) in both the exact and quantized kernels."""
    from deltaconv_tpu.ops.knn_topk import knn_topk

    b, n, k = 2, 256, 10
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    for q, atol in ((False, 1e-5), (True, 2e-3)):
        # quantized: winner distances are dequantized from the 16-bit
        # packed scores (error <= row range / 65534 per neighbor).
        idx, md = knn_topk(pos, k, interpret=True, quantized=q,
                           return_mean_dist=True)
        p, i = np.asarray(pos), np.asarray(idx)
        g = p[np.arange(b)[:, None, None], i]
        want = np.linalg.norm(g - p[:, :, None], axis=-1).sum(-1) / k
        np.testing.assert_allclose(np.asarray(md), want, atol=atol)


def test_fused_dense_build_matches_pipeline(rng):
    """The single-kernel build (ops/fused_build.py) reproduces
    densify(build_grad_div_fused(...)) after applying its deferred
    normalization scale, to bf16 rounding."""
    from deltaconv_tpu.geometry.frames import build_tangent_basis
    from deltaconv_tpu.ops.densify_op import densify_coefs
    from deltaconv_tpu.ops.fused_build import fused_dense_build
    from deltaconv_tpu.ops.wls_fused import build_grad_div_fused

    b, n, k = 2, 256, 8
    pos = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    xb, yb = build_tangent_basis(nrm)

    # self-first kNN (numpy exact)
    d = np.linalg.norm(np.asarray(pos)[:, :, None]
                       - np.asarray(pos)[:, None], axis=-1)
    idx = np.argsort(d, axis=-1)[:, :, :k].astype(np.int32)
    idx[:, :, 0] = np.arange(n)[None]
    idx = jnp.asarray(idx)
    mask = jnp.ones((b, n, k), bool)

    # reference pipeline (normalized)
    gd = build_grad_div_fused(pos, nrm, xb, yb, idx, mask,
                              interpret=True)
    wg_ref, wd_ref = densify_coefs(idx, gd.grad_coef, gd.div_coef,
                                   "bfloat16", 128, True)

    # fused kernel with the SAME bandwidth the pipeline derived
    dist = np.take_along_axis(d, np.asarray(idx), axis=-1)
    avg = jnp.asarray(dist.mean(axis=(1, 2)).astype(np.float32))
    wg, wd, rn = fused_dense_build(pos, nrm, xb, yb, idx, mask, avg,
                                   interpret=True)
    scale = 1.0 / jnp.max(rn, axis=1)
    sw = scale[:, None, None, None]

    for got, want in ((wg.astype(jnp.float32) * sw, wg_ref),
                      (wd.astype(jnp.float32) * sw, wd_ref)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want.astype(jnp.float32)),
            rtol=2e-2, atol=2e-4)


def test_coef_apply_matches_reference(rng):
    """Pallas coefficient-form grad/div application (the large-cloud
    path) matches the XLA gather+einsum reference, values and
    gradients."""
    from deltaconv_tpu.ops.coef_apply import (_reference_div,
                                              _reference_grad,
                                              coef_apply_div,
                                              coef_apply_grad)

    b, n, k, c = 2, 256, 8, 24
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, 2, c)).astype(np.float32))
    coef = jnp.asarray(rng.standard_normal((b, n, k, 2))
                       .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))

    # two-term bf16 hi/lo gather: ~2^-16 relative of the f32 result
    got = jax.jit(lambda *a: coef_apply_grad(*a, 128, True))(x, coef, idx)
    want = _reference_grad(x, coef, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    got_d = jax.jit(lambda *a: coef_apply_div(*a, 128, True))(v, coef, idx)
    want_d = _reference_div(v, coef, idx)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-4, atol=1e-4)

    # VJPs route through the Pallas gather/scatter kernels
    # (interpret=True): must match the reference-formulation VJP to
    # two-term-bf16 precision.
    ct = jnp.asarray(rng.standard_normal(got.shape).astype(np.float32))
    gx, gc = jax.jit(jax.grad(
        lambda xx, cc: jnp.sum(coef_apply_grad(xx, cc, idx, 128, True)
                               * ct), argnums=(0, 1)))(x, coef)
    wx, wc = jax.grad(
        lambda xx, cc: jnp.sum(_reference_grad(xx, cc, idx) * ct),
        argnums=(0, 1))(x, coef)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(wc),
                               rtol=1e-4, atol=1e-4)

    ctd = jnp.asarray(rng.standard_normal(got_d.shape).astype(np.float32))
    gv, gcd = jax.jit(jax.grad(
        lambda vv, cc: jnp.sum(coef_apply_div(vv, cc, idx, 128, True)
                               * ctd), argnums=(0, 1)))(v, coef)
    wv, wcd = jax.grad(
        lambda vv, cc: jnp.sum(_reference_div(vv, cc, idx) * ctd),
        argnums=(0, 1))(v, coef)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gcd), np.asarray(wcd),
                               rtol=1e-4, atol=1e-4)


def test_knn_topk_quantized_high_recall(rng):
    """The packed-key (bf16-granularity) kNN variant: self in slot 0,
    no duplicate winners, and >= 0.995 recall vs exact top-k (only
    neighbors whose scores collide at bf16 resolution may swap)."""
    from deltaconv_tpu.ops.knn_topk import knn_topk

    b, n, k = 2, 256, 12
    pos = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    idx = np.asarray(knn_topk(pos, k, interpret=True, quantized=True))

    pn = np.asarray(pos, np.float64)
    d2 = ((pn[:, :, None, :] - pn[:, None, :, :]) ** 2).sum(-1)
    for bi in range(b):
        np.fill_diagonal(d2[bi], -1.0)
    ref = np.argsort(d2, axis=-1, kind="stable")[:, :, :k]
    assert np.all(idx[:, :, 0] == np.arange(n)[None, :])
    hits = 0
    for bi in range(b):
        for ni in range(n):
            assert len(set(idx[bi, ni].tolist())) == k  # no duplicates
            hits += len(set(ref[bi, ni]) & set(idx[bi, ni]))
    assert hits / (b * n * k) >= 0.995


def _wls_inputs(rng, b=2, n=64, k=10):
    from deltaconv_tpu.geometry.frames import build_tangent_basis
    from deltaconv_tpu.geometry.knn import knn

    pos = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nbr, mask = jax.jit(jax.vmap(lambda p: knn(p, k)))(pos)
    xb, yb = jax.jit(jax.vmap(build_tangent_basis))(nrm)
    return pos, nrm, xb, yb, nbr, mask


def test_wls_fused_interpret_matches_reference(rng):
    """Interpret-mode Pallas fused build == XLA build_grad_div (CPU)."""
    from deltaconv_tpu.geometry.grad_div import build_grad_div
    from deltaconv_tpu.ops.wls_fused import build_grad_div_fused

    pos, nrm, xb, yb, nbr, mask = _wls_inputs(rng)
    ref = jax.jit(jax.vmap(
        lambda p, nn_, x, y, i, m: build_grad_div(p, nn_, x, y, i, m)
    ))(pos, nrm, xb, yb, nbr, mask)
    fused = build_grad_div_fused(pos, nrm, xb, yb, nbr, mask,
                                 tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.grad_coef),
                               np.asarray(fused.grad_coef), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.div_coef),
                               np.asarray(fused.div_coef), atol=2e-5)


def test_wls_fused_gradient_matches_reference(rng):
    """The custom VJP through the fused build matches grads of the
    XLA path w.r.t. positions (the geometry IS differentiated in the
    end-to-end training step, so this must stay exact)."""
    from deltaconv_tpu.geometry.grad_div import build_grad_div
    from deltaconv_tpu.ops.wls_fused import build_grad_div_fused

    pos, nrm, xb, yb, nbr, mask = _wls_inputs(rng)

    def loss_ref(p):
        gd = jax.vmap(
            lambda pp, nn_, x, y, i, m: build_grad_div(pp, nn_, x, y, i, m)
        )(p, nrm, xb, yb, nbr, mask)
        return jnp.sum(gd.grad_coef ** 2) + jnp.sum(jnp.sin(gd.div_coef))

    def loss_fused(p):
        gd = build_grad_div_fused(p, nrm, xb, yb, nbr, mask,
                                  tile=64, interpret=True)
        return jnp.sum(gd.grad_coef ** 2) + jnp.sum(jnp.sin(gd.div_coef))

    g_ref = np.asarray(jax.grad(loss_ref)(pos))
    g_fused = np.asarray(jax.grad(loss_fused)(pos))
    assert np.all(np.isfinite(g_fused))
    np.testing.assert_allclose(g_fused, g_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_wls_fused_matches_reference_on_tpu(rng):
    from deltaconv_tpu.geometry.frames import build_tangent_basis
    from deltaconv_tpu.geometry.grad_div import build_grad_div
    from deltaconv_tpu.geometry.knn import knn
    from deltaconv_tpu.ops.wls_fused import build_grad_div_fused

    b, n, k = 4, 256, 12
    pos = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nbr, mask = jax.jit(jax.vmap(lambda p: knn(p, k)))(pos)
    xb, yb = jax.jit(jax.vmap(build_tangent_basis))(nrm)

    ref = jax.jit(jax.vmap(
        lambda p, nn_, x, y, i, m: build_grad_div(p, nn_, x, y, i, m)
    ))(pos, nrm, xb, yb, nbr, mask)
    fused = jax.jit(build_grad_div_fused)(pos, nrm, xb, yb, nbr, mask)
    # 5e-5: the Pallas table gather reconstructs positions from a
    # hi/lo bf16 split (~1e-6 rel), slightly amplified by the WLS
    # solve; the XLA reference gathers exact f32.
    np.testing.assert_allclose(
        np.asarray(ref.grad_coef), np.asarray(fused.grad_coef), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.div_coef), np.asarray(fused.div_coef), atol=5e-5
    )


def test_gather_scatter_channel_split(rng, monkeypatch):
    """Wide-channel gathers/scatters recurse into channel halves when
    the VMEM estimate exceeds budget — results must be identical."""
    import deltaconv_tpu.ops.gather_rows as GR

    b, n, k, c = 2, 64, 6, 20
    table = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((b, c, k, n)).astype(np.float32))

    whole = GR.gather_rows(table, idx, 128, True)
    sc_whole = GR.scatter_rows(g, idx, n, 128, True)
    monkeypatch.setattr(GR, "_VMEM_BUDGET", 1)
    split = GR.gather_rows(table, idx, 128, True)
    sc_split = GR.scatter_rows(g, idx, n, 128, True)
    np.testing.assert_allclose(np.asarray(split), np.asarray(whole),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sc_split), np.asarray(sc_whole),
                               atol=1e-6)


def _distinct_idx(rng, b, n, k):
    """Random neighbor lists with DISTINCT columns per row (the kNN
    invariant the OR-packed assembly kernels rely on)."""
    idx = np.empty((b, n, k), np.int32)
    for bb in range(b):
        for t in range(n):
            idx[bb, t] = rng.permutation(n)[:k]
    return jnp.asarray(idx)


def test_densify_int8_interpret_matches_fallback(rng):
    """Interpret-mode int8 packed assembly == the XLA quantize+one-hot
    fallback, bit-exact (same quantization, distinct columns)."""
    from deltaconv_tpu.geometry import dense as D
    from deltaconv_tpu.geometry.grad_div import GradDiv
    from deltaconv_tpu.ops.densify_op import densify_coefs_int8

    b, n, k = 2, 96, 8
    idx = _distinct_idx(rng, b, n, k)
    mask = jnp.ones((b, n, k), bool)
    gc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    dc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    gd = GradDiv(nbr_idx=idx, nbr_mask=mask, grad_coef=gc, div_coef=dc)

    ref = D.densify(gd, jnp.int8)  # XLA fallback on CPU
    wg, wd, sg, sd = densify_coefs_int8(idx, gc, dc, interpret=True)
    assert ref.w_grad.dtype == jnp.int8 and wg.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(wg), np.asarray(ref.w_grad))
    np.testing.assert_array_equal(np.asarray(wd), np.asarray(ref.w_div))
    np.testing.assert_allclose(np.asarray(sg),
                               np.asarray(ref.op_scale_grad), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sd),
                               np.asarray(ref.op_scale_div), rtol=1e-6)


def test_densify_int8_apply_tolerance(rng):
    """Quantized operator applies track the f32 dense applies on REAL
    operators (built from a synthetic cloud): 8-bit operators + 8-bit
    activations, per-cloud symmetric scales."""
    from deltaconv_tpu.geometry import dense as D
    from deltaconv_tpu.models.deltanet_base import build_operators

    b, n, k, c = 2, 128, 12, 16
    pos = jnp.asarray(rng.random((b, n, 3)).astype(np.float32))
    nrm = rng.standard_normal((b, n, 3)).astype(np.float32)
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))
    gd = build_operators(pos, k, normal=nrm)

    dense32 = D.densify(gd)
    dense8 = D.densify(gd, jnp.int8)
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, n, 2, c)).astype(np.float32))

    def relerr(a, bb):
        a, bb = np.asarray(a, np.float64), np.asarray(bb, np.float64)
        return np.linalg.norm(a - bb) / max(np.linalg.norm(bb), 1e-30)

    eg = relerr(dense8.grad(x), dense32.grad(x))
    ed = relerr(dense8.div(v), dense32.div(v))
    assert eg < 0.02, f"grad relative error {eg}"
    assert ed < 0.02, f"div relative error {ed}"


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_densify_int8_matches_fallback_tpu(rng):
    """The on-TPU int8 packed assembly is bit-exact against the XLA
    quantize+one-hot fallback."""
    from deltaconv_tpu.geometry import dense as D
    from deltaconv_tpu.geometry.grad_div import GradDiv
    from deltaconv_tpu.ops.densify_op import densify_coefs_int8

    b, n, k = 2, 256, 12
    idx = _distinct_idx(rng, b, n, k)
    mask = jnp.ones((b, n, k), bool)
    gc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))
    dc = jnp.asarray(rng.standard_normal((b, n, k, 2)).astype(np.float32))

    wg, wd, sg, sd = jax.jit(densify_coefs_int8)(idx, gc, dc)

    from deltaconv_tpu.ops.densify_op import _quantize_pack
    packed, sg_raw, sd_raw = _quantize_pack(gc, dc)
    packed = np.asarray(packed)
    want_g = np.zeros((b, 2, n, n), np.int8)
    want_d = np.zeros((b, 2, n, n), np.int8)
    def sbyte(p, shift):
        v = (int(p) >> shift) & 0xFF
        return v - 256 if v >= 128 else v

    for bb in range(b):
        for t in range(n):
            for kk in range(k):
                p = np.uint32(np.asarray(packed[bb, t, kk], np.int64)
                              & 0xFFFFFFFF)
                col = int(idx[bb, t, kk])
                want_g[bb, 0, t, col] = sbyte(p, 0)
                want_g[bb, 1, t, col] = sbyte(p, 8)
                want_d[bb, 0, t, col] = sbyte(p, 16)
                want_d[bb, 1, t, col] = sbyte(p, 24)
    np.testing.assert_array_equal(np.asarray(wg), want_g)
    np.testing.assert_array_equal(np.asarray(wd), want_d)
    np.testing.assert_allclose(np.asarray(sg), np.asarray(sg_raw) / 127.0,
                               rtol=1e-6)


def test_gather_max_int8_interpret(rng):
    """Interpret-mode int8 quantized gather-max == the quantized
    numpy reference (max commutes with the per-cloud scale)."""
    from deltaconv_tpu.ops.gather_max import gather_max_int8, int8_quantize

    b, n, k, c = 2, 128, 10, 16
    h = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)

    got = gather_max_int8(h, idx, mask, interpret=True)

    hq, s = int8_quantize(h)
    hqi = np.asarray(hq, np.int32)
    want = np.zeros((b, n, c), np.float32)
    for bb in range(b):
        for t in range(n):
            vals = [hqi[bb, idx[bb, t, kk]] for kk in range(k)
                    if bool(mask[bb, t, kk])]
            if vals:
                want[bb, t] = np.max(vals, axis=0) * float(s[bb])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_gather_matmul_max_int8_interpret(rng):
    """Interpret-mode int8 gather-then-matmul max == the quantized-
    domain reference (self-slot read included)."""
    from deltaconv_tpu.ops.gather_max import (
        gather_matmul_max_int8,
        int8_quantize,
    )

    b, n, k, ci, co = 2, 128, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((ci, co)).astype(np.float32))
    base = np.tile(np.arange(n, dtype=np.int32)[None, :, None], (b, 1, k))
    base[..., 1:] = rng.integers(0, n, (b, n, k - 1))
    idx = jnp.asarray(base)  # self in slot 0
    mask = np.asarray(rng.random((b, n, k)) > 0.2)
    mask[..., 0] = True
    mask = jnp.asarray(mask)

    xq, s = int8_quantize(x)
    got = gather_matmul_max_int8(xq, w, idx, mask, interpret=True,
                                 self_slot0=True)

    wb = np.asarray(w.astype(jnp.bfloat16), np.float32)
    y = np.asarray(xq, np.float32) @ wb  # quantized-domain products
    want = np.full((b, n, co), -3.0e38, np.float32)
    for bb in range(b):
        for t in range(n):
            vals = [y[bb, idx[bb, t, kk]] for kk in range(k)
                    if bool(mask[bb, t, kk])]
            if vals:
                want[bb, t] = np.max(vals, axis=0)
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=1e-2)


def test_gather_mlp_max_interpret(rng):
    """Fused gather + depth-2 eval MLP + max (the depth>=2 scalar-
    stream fast path) == its XLA reference, centralized and not,
    with and without the self-slot shortcut.

    Pinned to the host CPU device even in TPU mode: the interpret
    surrogate's bf16 round-trips (``f32 -> bf16 -> f32``) are elided by
    the TPU XLA pipeline (the hazard documented at
    ops/gather_max.py::_bwd_mm_kernel), flipping near-tie max winners
    vs the rounding reference; the REAL kernel is covered on TPU by
    test_tpu_paths.py::test_seg_config_deep_fused_path_matches_reference."""
    from deltaconv_tpu.ops.gather_mlp_max import _reference, gather_mlp_max

    cpu = jax.devices("cpu")[0]
    b, n, k, ci, cm, co = 2, 128, 7, 16, 24, 32
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((ci, cm)).astype(np.float32)),
          jnp.asarray(rng.standard_normal((cm, co)).astype(np.float32))]
    affines = [(jnp.asarray(rng.standard_normal(cm).astype(np.float32)),
                jnp.asarray(rng.standard_normal(cm).astype(np.float32)))]
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)

    with jax.default_device(cpu):
        for centralized in (False, True):
            for skip0 in (False, True):
                got = jax.jit(lambda x, i, m: gather_mlp_max(
                    x, ws, affines, i, m, centralized=centralized,
                    skip_slot0=skip0, interpret=True))(x, idx, mask)
                want = _reference(x, ws, affines, idx, mask, centralized,
                                  1 if skip0 else 0)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-2,
                    atol=2e-2)


def test_gather_mlp_max_z0_epilogue_interpret(rng):
    """gather_mlp_max's fused self-slot merge + BN/LeakyReLU epilogue
    is BIT-exact vs the plain kernel + the XLA tail it replaces
    (nn/deltaconv.py DeepMaxMLP eval), for both z0 forms (constant
    broadcast row / per-point rows)."""
    from deltaconv_tpu.ops.gather_mlp_max import gather_mlp_max

    cpu = jax.devices("cpu")[0]
    b, n, k, ci, cm, co = 2, 100, 7, 16, 24, 32
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((ci, cm)).astype(np.float32)),
          jnp.asarray(rng.standard_normal((cm, co)).astype(np.float32))]
    affines = [(jnp.asarray(rng.standard_normal(cm).astype(np.float32)),
                jnp.asarray(rng.standard_normal(cm).astype(np.float32)))]
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    idx = idx.at[:, :, 0].set(jnp.arange(n)[None])
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)
    mask = mask.at[:, :, 0].set(True)
    mask = mask.at[0, 7].set(False)  # an all-masked row
    sign, inv, mean, bias = _affine_vectors(rng, co)

    with jax.default_device(cpu):
        for z0 in (jnp.asarray(rng.standard_normal(co).astype(np.float32)
                               ).astype(jnp.bfloat16).astype(jnp.float32),
                   jnp.asarray(rng.standard_normal((b, n, co)).astype(
                       np.float32)).astype(jnp.bfloat16
                                           ).astype(jnp.float32)):
            m = jax.jit(lambda x, i, mk: gather_mlp_max(
                x, ws, affines, i, mk, skip_slot0=True,
                interpret=True))(x, idx, mask)
            z0b = (jnp.broadcast_to(z0[None, None, :], m.shape)
                   if z0.ndim == 1 else z0)
            mm = jnp.maximum(m, jnp.where(mask[..., 0:1], z0b, -3.0e38))
            ref = _lrelu((sign * mm - mean) * inv + bias)
            ref = jnp.where(jnp.any(mask, -1)[..., None], ref,
                            0.0).astype(jnp.bfloat16)
            got = jax.jit(lambda x, i, mk: gather_mlp_max(
                x, ws, affines, i, mk, skip_slot0=True, interpret=True,
                z0=z0, epilogue=(sign, inv, mean, bias)))(x, idx, mask)
            np.testing.assert_array_equal(np.asarray(got, np.float32),
                                          np.asarray(ref, np.float32))


def test_knn_topk_table_interpret_matches_local_knn(rng):
    """The column-tiled table kNN kernel (the point-sharded local kNN
    on TPU) == the XLA `_local_knn` paths bit-for-bit: same score
    expression, self pinned to slot 0, masked columns excluded, ties
    to the lowest global index — including the degenerate
    fewer-valid-columns-than-k case, where both emit distinct masked
    columns in lowest-index order. CPU-pinned: the interpret surrogate
    must execute with host semantics (see test_gather_mlp_max_interpret)."""
    import deltaconv_tpu.parallel.point_sharding as PS
    from deltaconv_tpu.ops.knn_topk import knn_topk_table

    cpu = jax.devices("cpu")[0]
    n_t, n_q, k, off = 700, 300, 11, 150
    pos_t = jnp.asarray(rng.standard_normal((n_t, 3)).astype(np.float32))
    pos_q = pos_t[off:off + n_q]
    pm = jnp.asarray(rng.random(n_t) > 0.3)
    pm = pm.at[off:off + n_q].set(True)

    with jax.default_device(cpu):
        # Unmasked and masked, with non-dividing tile sizes.
        for mask in (None, pm):
            ref = np.asarray(PS._local_knn(pos_q, pos_t, k, off, mask))
            got = np.asarray(knn_topk_table(
                pos_q, pos_t, k, row_offset=off, point_mask=mask,
                tile_q=64, tile_c=96, interpret=True))
            np.testing.assert_array_equal(got, ref)

        # Degenerate: fewer valid columns than k.
        pm4 = jnp.zeros(n_t, bool).at[:5].set(True)
        pm4 = pm4.at[off:off + 8].set(True)
        q4 = pos_t[off:off + 8]
        ref4 = np.asarray(PS._local_knn(q4, pos_t, k, off, pm4))
        got4 = np.asarray(knn_topk_table(
            q4, pos_t, k, row_offset=off, point_mask=pm4,
            tile_q=8, tile_c=128, interpret=True))
        np.testing.assert_array_equal(got4, ref4)


def test_knn_topk_table_quantized_interpret(rng):
    """The packed-key table kernel (the point-sharded analog of the
    headline's ``knn_method="approx"``): self stays pinned to slot 0,
    masked columns are never selected, rows have no duplicate winners,
    and the winner sets match the exact kernel at >= 0.99 recall (the
    per-tile 16-bit quantization can only swap near-ties)."""
    import deltaconv_tpu.parallel.point_sharding as PS
    from deltaconv_tpu.ops.knn_topk import knn_topk_table

    cpu = jax.devices("cpu")[0]
    n_t, n_q, k, off = 700, 300, 11, 150
    pos_t = jnp.asarray(rng.standard_normal((n_t, 3)).astype(np.float32))
    pos_q = pos_t[off:off + n_q]
    pm = jnp.asarray(rng.random(n_t) > 0.3)
    pm = pm.at[off:off + n_q].set(True)

    with jax.default_device(cpu):
        for mask in (None, pm):
            ref = np.asarray(PS._local_knn(pos_q, pos_t, k, off, mask))
            got = np.asarray(knn_topk_table(
                pos_q, pos_t, k, row_offset=off, point_mask=mask,
                tile_q=64, tile_c=96, interpret=True, quantized=True))
            assert np.all(got[:, 0] == off + np.arange(n_q))
            if mask is not None:
                pmn = np.asarray(mask)
                assert pmn[got.reshape(-1)].all()
            hits = 0
            for i in range(n_q):
                assert len(set(got[i])) == k, f"row {i} duplicates"
                hits += len(set(ref[i]) & set(got[i]))
            assert hits / (n_q * k) >= 0.99

        # Degenerate rows (< k valid columns): like the exact kernel,
        # the quantized one must fill with DISTINCT masked columns in
        # ascending order — never duplicate an already-picked winner
        # (the round-4 review repro: 5 valid, k=11 emitted [.. 0 0 0]).
        n_valid, kq, nq2 = 5, 11, 4
        pm_few = np.zeros(n_t, bool)
        pm_few[:n_valid] = True
        with jax.default_device(cpu):
            got = np.asarray(knn_topk_table(
                pos_t[:nq2], pos_t, kq, row_offset=0,
                point_mask=jnp.asarray(pm_few), tile_q=64, tile_c=96,
                interpret=True, quantized=True))
        for i in range(nq2):
            row = got[i]
            assert len(set(row)) == kq, f"degenerate row {i}: {row}"
            assert row[0] == i  # self pinned
            valids = sorted(c for c in row if pm_few[c])
            assert valids == list(range(n_valid)), row
            fillers = [int(c) for c in row if not pm_few[c]]
            assert fillers == sorted(fillers) and len(fillers) == kq - n_valid


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("DELTACONV_TEST_TPU") != "1",
                    reason="TPU kernel path (set DELTACONV_TEST_TPU=1)")
def test_knn_topk_table_tpu_set_equality(rng):
    """On the real chip the table kernel's winner SETS equal the XLA
    reference (order may differ on near-ties: the kernel's f32 VPU
    FMAs vs XLA's HIGHEST 3-pass MXU dot round differently in the last
    bit; every downstream consumer is slot-permutation-invariant past
    the pinned self slot 0)."""
    import deltaconv_tpu.parallel.point_sharding as PS
    from deltaconv_tpu.ops.knn_topk import knn_topk_table

    n_t, n_q, k, off = 9000, 2048, 20, 1000
    pos_t = jnp.asarray(rng.standard_normal((n_t, 3)).astype(np.float32))
    pos_q = pos_t[off:off + n_q]
    sq_l = jnp.sum(pos_q * pos_q, -1)
    sq_f = jnp.sum(pos_t * pos_t, -1)
    s = PS._knn_scores(pos_q, sq_l, pos_t, sq_f,
                       off + jnp.arange(n_q), jnp.arange(n_t))
    _, ref = jax.lax.top_k(s, k)
    got = np.asarray(knn_topk_table(pos_q, pos_t, k, row_offset=off))
    ref = np.asarray(ref)
    assert np.all(got[:, 0] == off + np.arange(n_q))
    mismatch = sum(set(ref[i]) != set(got[i]) for i in range(n_q))
    assert mismatch == 0, f"{mismatch} rows differ as sets"

    # Quantized packed-key variant (the point-shard bench path): self
    # pinned, no duplicate winners, recall >= 0.995 vs the exact sets.
    gotq = np.asarray(knn_topk_table(pos_q, pos_t, k, row_offset=off,
                                     quantized=True))
    assert np.all(gotq[:, 0] == off + np.arange(n_q))
    hits = 0
    for i in range(n_q):
        assert len(set(gotq[i])) == k, f"row {i} duplicates"
        hits += len(set(ref[i]) & set(gotq[i]))
    assert hits / (n_q * k) >= 0.995


def test_gather_mlp_max_three_layers_interpret(rng):
    """The fused kernel generalizes past depth 2. CPU-pinned like
    test_gather_mlp_max_interpret (bf16 round-trip elision on TPU)."""
    from deltaconv_tpu.ops.gather_mlp_max import _reference, gather_mlp_max

    cpu = jax.devices("cpu")[0]
    b, n, k, c = 1, 128, 5, 16
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
          for _ in range(3)]
    affines = [(jnp.asarray(rng.standard_normal(c).astype(np.float32)),
                jnp.asarray(rng.standard_normal(c).astype(np.float32)))
               for _ in range(2)]
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, n, k)) > 0.2)

    with jax.default_device(cpu):
        got = jax.jit(lambda x, i, m: gather_mlp_max(
            x, ws, affines, i, m, interpret=True))(x, idx, mask)
        want = _reference(x, ws, affines, idx, mask, False, 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernels need a TPU")
def test_gather_matmul_max_train_kernel(rng):
    """The training gather-then-matmul max kernel: values and winner
    slots equal the rounded-domain reference exactly (the kernel
    rounds its product to bf16 pre-max, so both sides pick winners in
    the SAME domain — no tie ambiguity), and the custom VJP routes to
    the winning edge with the per-point-Dense backward dtypes."""
    # NOT `import deltaconv_tpu.ops.gather_max as GM`: the package
    # __init__ rebinds that attribute to the FUNCTION, shadowing the
    # module (and `import ... as` resolves via the attribute).
    import importlib

    GM = importlib.import_module("deltaconv_tpu.ops.gather_max")

    b, n, k, ci, co = 2, 256, 10, 64, 128
    x = jnp.asarray(rng.standard_normal((b, n, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ci, co)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    base = np.tile(np.arange(n, dtype=np.int32)[None, :, None], (b, 1, k))
    base[..., 1:] = rng.integers(0, n, (b, n, k - 1))
    idx = jnp.asarray(base)
    mask = np.asarray(rng.random((b, n, k)) > 0.2)
    mask[..., 0] = True
    mask = jnp.asarray(mask)

    out, win = GM._mm_train_pallas_fwd(x, w, idx, mask)
    # Rounded-domain reference: bf16 x bf16 dot -> bf16 product, same
    # as the kernel's f32-accumulate-then-round.
    yn = np.asarray(jnp.dot(x, w), np.float32)  # [b, n, co]
    want = np.full((b, n, co), -3.0e38, np.float32)
    want_win = np.zeros((b, n, co), np.int32)
    idx_n, mask_n = np.asarray(idx), np.asarray(mask)
    for bb in range(b):
        for t in range(n):
            for kk in range(k):
                if not mask_n[bb, t, kk]:
                    continue
                vk = yn[bb, idx_n[bb, t, kk]]
                upd = vk > want[bb, t]
                want[bb, t] = np.where(upd, vk, want[bb, t])
                want_win[bb, t] = np.where(upd, kk, want_win[bb, t])
    np.testing.assert_array_equal(np.asarray(out, np.float32), want)
    np.testing.assert_array_equal(np.asarray(win), want_win)

    # VJP: route the cotangent to the winning edges, then the standard
    # Dense backward contractions.
    g = jnp.asarray(rng.standard_normal((b, n, co)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    _, vjp = jax.vjp(
        lambda xx, ww: GM.gather_matmul_max_train(xx, ww, idx, mask),
        x, w)
    dx, dw = vjp(out.astype(jnp.bfloat16) * 0 + g)  # g with out's aval
    gn = np.asarray(g, np.float32)
    dy = np.zeros((b, n, co), np.float32)
    for bb in range(b):
        for t in range(n):
            for c in range(co):
                dy[bb, idx_n[bb, t, want_win[bb, t, c]], c] += gn[bb, t, c]
    dyc = np.asarray(jnp.asarray(dy).astype(jnp.bfloat16), np.float32)
    wn = np.asarray(w, np.float32)
    xn = np.asarray(x, np.float32)
    dx_ref = dyc @ wn.T
    dw_ref = np.einsum("bni,bno->io", xn, dyc)
    np.testing.assert_allclose(np.asarray(dx, np.float32), dx_ref,
                               rtol=2e-2, atol=2e-2)
    scale = np.abs(dw_ref).max()
    np.testing.assert_allclose(np.asarray(dw, np.float32), dw_ref,
                               rtol=2e-2, atol=2e-2 * scale)

    # self_slot0 variants: slot 0 reads its own rows in the forward
    # and routes its cotangents by direct addressing in the backward —
    # identical values/winners, dx/dw equal up to f32 re-association
    # of the per-row adds.
    out0, win0 = GM._mm_train_pallas_fwd(x, w, idx, mask, self0=True)
    np.testing.assert_array_equal(np.asarray(out0, np.float32), want)
    np.testing.assert_array_equal(np.asarray(win0), want_win)
    _, vjp0 = jax.vjp(
        lambda xx, ww: GM.gather_matmul_max_train(xx, ww, idx, mask,
                                                  True),
        x, w)
    dx0, dw0 = vjp0(out.astype(jnp.bfloat16) * 0 + g)
    np.testing.assert_allclose(np.asarray(dx0, np.float32),
                               np.asarray(dx, np.float32),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw0, np.float32),
                               np.asarray(dw, np.float32),
                               rtol=1e-5, atol=1e-5 * scale)
