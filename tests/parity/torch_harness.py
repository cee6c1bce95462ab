"""Plain-torch re-execution of the reference's operator math.

Numeric ground truth for the parity suite: the formulas of
/root/reference/deltaconv/geometry/grad_div_mls.py:10-194 evaluated
with torch on DENSE ``[N, K]`` neighbor lists (torch_sparse /
torch_scatter are not installed here, and the ragged edge_index adds
nothing numerically — ``row`` is just ``arange(N)`` repeated K times
for a fixed-k graph). Everything runs in float64 so the harness acts
as an oracle for BOTH the reference (f32 torch) and our JAX pipeline.

This is a test fixture, not framework code; the frameworks' own
implementations never import it.
"""

import torch


def tangent_basis(normal):
    """grad_div_mls.py:50-69: frame from a given normal."""
    n = normal.shape[0]
    test = torch.zeros(n, 3, dtype=normal.dtype)
    test[:, 0] = 1.0
    alt = torch.zeros(n, 3, dtype=normal.dtype)
    alt[:, 1] = 1.0
    align = (normal * test).sum(-1, keepdim=True).abs() > 0.9
    test = torch.where(align, alt, test)
    x = torch.cross(test, normal, dim=-1)
    x = x / x.norm(dim=-1, keepdim=True).clamp(1e-5)
    y = torch.cross(normal, x, dim=-1)
    y = y / y.norm(dim=-1, keepdim=True).clamp(1e-5)
    return x, y


def estimate_basis(pos, nbr_idx, orientation=None):
    """grad_div_mls.py:10-47: frames from the SVD of neighbor offsets."""
    local = (pos[nbr_idx] - pos[:, None, :]).transpose(-2, -1)  # [N,3,K]
    U = torch.linalg.svd(local).U
    normal = U[:, :, 2]
    normal = normal / normal.norm(dim=-1, keepdim=True).clamp(1e-5)
    if orientation is not None:
        flip = (normal * orientation).sum(-1, keepdim=True) < 0
        normal = torch.where(flip, -normal, normal)
    x = U[:, :, 0]
    x = x / x.norm(dim=-1, keepdim=True).clamp(1e-5)
    y = torch.cross(normal, x, dim=-1)
    y = y / y.norm(dim=-1, keepdim=True).clamp(1e-5)
    return normal, x, y


def coords_projected(pos, normal, x_basis, y_basis, nbr_idx):
    """grad_div_mls.py:72-97 on dense neighbor lists -> [N, K, 2]."""
    local = pos[nbr_idx] - pos[:, None, :]
    local = local - normal[:, None, :] * (
        local * normal[:, None, :]).sum(-1, keepdim=True)
    u = (local * x_basis[:, None, :]).sum(-1)
    v = (local * y_basis[:, None, :]).sum(-1)
    return torch.stack([u, v], dim=-1)


def gaussian_weights(dist, kernel_width=1.0):
    """grad_div_mls.py:100-116, single cloud (batch all-zeros)."""
    avg = dist.mean(dim=1).mean()
    w = torch.exp(-dist.pow(2) / (kernel_width * avg).pow(2))
    return w / w.sum(dim=1, keepdim=True).clamp(1e-5)


def weighted_least_squares(coords, weights, regularizer):
    """grad_div_mls.py:119-152 (explicit 6x6 inverse) -> [N, K, 6]."""
    u, v = coords[..., 0], coords[..., 1]
    B = torch.stack(
        [torch.ones_like(u), u, v, u * u, u * v, v * v], dim=-1)
    BT = (weights[..., None] * B).transpose(-2, -1)  # [N, 6, K]
    A = BT @ B + regularizer * torch.eye(6, dtype=B.dtype)
    return (torch.linalg.inv(A) @ BT).transpose(-2, -1)


def fit_vector_mapping(pos, normal, x_basis, y_basis, nbr_idx, wls,
                       coords):
    """grad_div_mls.py:155-194 -> [N, K, 2, 2]."""
    offsets = pos[nbr_idx] - pos[:, None, :]
    patch_f = (offsets * normal[:, None, :]).sum(-1)  # [N, K]
    coeff = (wls * patch_f[..., None]).sum(dim=1)  # [N, 6]

    u, v = coords[..., 0], coords[..., 1]
    h_x = coeff[:, 1:2] + 2 * coeff[:, 3:4] * u + coeff[:, 4:5] * v
    h_y = coeff[:, 2:3] + coeff[:, 4:5] * u + 2 * coeff[:, 5:6] * v

    gamma_x = x_basis[:, None, :] + normal[:, None, :] * h_x[..., None]
    gamma_y = y_basis[:, None, :] + normal[:, None, :] * h_y[..., None]

    det = 1 + h_x.pow(2) + h_y.pow(2)
    E, F, G = 1 + h_x.pow(2), h_x * h_y, 1 + h_y.pow(2)
    inv_metric = torch.stack([G, -F, -F, E], dim=-1).view(
        *h_x.shape, 2, 2) / det[..., None, None]

    xb_j, yb_j = x_basis[nbr_idx], y_basis[nbr_idx]
    bt = torch.stack([
        (gamma_x * xb_j).sum(-1), (gamma_x * yb_j).sum(-1),
        (gamma_y * xb_j).sum(-1), (gamma_y * yb_j).sum(-1),
    ], dim=-1).view(*h_x.shape, 2, 2)
    return inv_metric @ bt


def build_grad_div(pos, normal, x_basis, y_basis, nbr_idx,
                   kernel_width=1.0, regularizer=0.001,
                   normalized=True):
    """grad_div_mls.py:197-277 -> dense ``grad [2N, N], div [N, 2N]``
    with the reference's interleaved row/column layout (rows 2i, 2i+1
    hold the u/v components at point i)."""
    n, k = nbr_idx.shape
    coords = coords_projected(pos, normal, x_basis, y_basis, nbr_idx)
    dist = (pos[nbr_idx] - pos[:, None, :]).norm(dim=-1)
    weights = gaussian_weights(dist, kernel_width)
    wls = weighted_least_squares(coords, weights, regularizer)

    gvals = wls[..., 1:3]  # [N, K, 2] -> rows c1 (d/du), c2 (d/dv)
    if normalized:
        inf_norm = gvals.abs().sum(dim=1).norm(dim=-1).max()
        if inf_norm > 1e-5:
            gvals = gvals / inf_norm

    mapping = fit_vector_mapping(pos, normal, x_basis, y_basis,
                                 nbr_idx, wls, coords)
    dvals = (gvals[..., None, :] @ mapping).squeeze(-2)  # [N, K, 2]

    grad = torch.zeros(2 * n, n, dtype=pos.dtype)
    div = torch.zeros(n, 2 * n, dtype=pos.dtype)
    rows = torch.arange(n)
    for kk in range(k):
        cols = nbr_idx[:, kk]
        grad[2 * rows, cols] += gvals[:, kk, 0]
        grad[2 * rows + 1, cols] += gvals[:, kk, 1]
        div[rows, 2 * cols] += dvals[:, kk, 0]
        div[rows, 2 * cols + 1] += dvals[:, kk, 1]
    return grad, div
