"""Connection (parallel transport) parity vs the EXECUTED reference.

Runs /root/reference/deltaconv/geometry/connection.py (pure torch, via
the pyg shims only for package import) against
``deltaconv_tpu.geometry.connection`` on random frame pairs, including
the unoriented (reflection) branch and the degenerate aligned-normals
case."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

from tools.pyg_shims import load_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deltaconv_tpu.geometry.connection import build_transport  # noqa: E402
from deltaconv_tpu.geometry.frames import build_tangent_basis  # noqa: E402


def _frames(seed, n):
    torch.manual_seed(seed)
    nrm = torch.nn.functional.normalize(torch.randn(n, 3), dim=-1)
    return nrm


@pytest.mark.parametrize("non_oriented", [True, False])
def test_build_transport_matches_executed_reference(non_oriented):
    ref = load_reference()
    n = 257
    t_n = _frames(0, n)
    s_n = _frames(1, n)
    # Exercise the degenerate branch: some target normals exactly equal
    # (or oppose) the source normal -> zero rotation axis.
    t_n[:16] = s_n[:16]
    t_n[16:32] = -s_n[16:32]

    t_x, t_y = build_tangent_basis(jnp.asarray(t_n.numpy()))
    s_x, _ = build_tangent_basis(jnp.asarray(s_n.numpy()))

    want = ref.geometry.build_transport(
        t_n, torch.from_numpy(np.asarray(t_x)),
        torch.from_numpy(np.asarray(t_y)), s_n,
        torch.from_numpy(np.asarray(s_x)),
        non_oriented=non_oriented).numpy()

    got = np.asarray(build_transport(
        jnp.asarray(t_n.numpy()), t_x, t_y, jnp.asarray(s_n.numpy()),
        s_x, non_oriented=non_oriented))

    np.testing.assert_allclose(got.reshape(n, 4), want, atol=2e-5)
