"""Executable stand-ins for the reference's CUDA-era dependencies.

The upstream implementation (/root/reference, read-only) imports
``torch_scatter``, ``torch_sparse``, ``torch_geometric`` and its own
``deltaconv_bindings`` C++ module — none of which are installed here.
This module provides the MINIMAL, numerically faithful subset those
files actually use (grep-verified against the reference tree), wired
into ``sys.modules`` so the reference package imports unmodified:

* ``torch_scatter.scatter_add/scatter_mean/scatter_max/scatter``
  (grad_div_mls.py:4, nn/deltaconv.py:2),
* ``torch_sparse.SparseTensor`` with dense ``@``
  (grad_div_mls.py:263,275; applied in nn/deltaconv.py:57,66 and
  geometry/operators.py:27-43),
* ``torch_geometric.nn.knn_graph/global_max_pool/global_mean_pool``
  (models/deltanet_base.py:2, deltanet_classification.py:3) and
  ``torch_geometric.nn.inits.zeros`` (nn/nonlin.py:5),
* a ``deltaconv_bindings`` stub (geometry/fps.py:3 — import-time only;
  calling geodesicFPS raises).

Purpose: executing the REFERENCE code itself for end-to-end parity
tests and for a MEASURED baseline throughput on this host's CPU
(BASELINE.md's reference number is otherwise an estimate). This is
tooling around the read-only reference — the framework never imports
it, and nothing here reimplements framework functionality.
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def _dim_size(index, dim_size):
    return int(index.max()) + 1 if dim_size is None else dim_size


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    if dim != 0 or out is not None:
        raise NotImplementedError("shim supports dim=0, out=None")
    n = _dim_size(index, dim_size)
    res = src.new_zeros((n,) + src.shape[1:])
    return res.index_add_(0, index, src)


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    s = scatter_add(src, index, dim, out, dim_size)
    cnt = scatter_add(torch.ones_like(index, dtype=src.dtype), index,
                      dim, None, s.shape[0])
    return s / cnt.clamp(min=1).view((-1,) + (1,) * (src.dim() - 1))


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    """Returns ``(values, argmax)``; the reference only consumes
    ``[0]`` (grad_div_mls.py:259), so argmax is None."""
    if dim != 0 or out is not None:
        raise NotImplementedError("shim supports dim=0, out=None")
    n = _dim_size(index, dim_size)
    res = src.new_full((n,) + src.shape[1:], float("-inf"))
    idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    res = res.scatter_reduce(0, idx, src, reduce="amax",
                             include_self=True)
    return res, None


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    if reduce == "max":
        return scatter_max(src, index, dim, out, dim_size)[0]
    if reduce == "mean":
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce in ("sum", "add"):
        return scatter_add(src, index, dim, out, dim_size)
    raise NotImplementedError(f"reduce={reduce!r}")


# ---------------------------------------------------------------------------
# torch_sparse
# ---------------------------------------------------------------------------

class SparseTensor:
    """COO-constructed, CSR-backed sparse matrix supporting the one
    operation the reference performs: ``sparse @ dense_2d``."""

    def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
        coo = torch.sparse_coo_tensor(
            torch.stack([row, col]), value, size=tuple(sparse_sizes)
        ).coalesce()
        self._csr = coo.to_sparse_csr()

    def __matmul__(self, dense):
        squeeze = dense.dim() == 1
        if squeeze:
            dense = dense[:, None]
        out = torch.sparse.mm(self._csr, dense)
        return out[:, 0] if squeeze else out

    def sparse_sizes(self):
        return tuple(self._csr.shape)

    def to_dense(self):
        return self._csr.to_dense()


# ---------------------------------------------------------------------------
# torch_geometric.nn
# ---------------------------------------------------------------------------

def knn_graph(x, k, batch=None, loop=False, flow="source_to_target",
              cosine=False, num_workers=1):
    """Exact per-cloud kNN. The reference calls this with ``loop=True,
    flow='target_to_source'`` and treats ``edge_index[0]`` as the
    center and ``edge_index[1]`` as the neighbor, with the self-loop
    counted inside k (models/deltanet_base.py:53,65) — the only
    convention this shim implements."""
    if not loop or flow != "target_to_source" or cosine:
        raise NotImplementedError("shim implements the reference's "
                                  "loop=True/target_to_source call only")
    if batch is None:
        batch = x.new_zeros(x.size(0), dtype=torch.long)
    rows, cols = [], []
    for b in torch.unique(batch):
        idx = (batch == b).nonzero(as_tuple=True)[0]
        p = x[idx]
        d = torch.cdist(p, p)
        # Pin the self-loop to slot 0 regardless of float ties.
        d.fill_diagonal_(-1.0)
        nn = d.topk(min(k, p.size(0)), largest=False).indices
        rows.append(idx.view(-1, 1).expand_as(nn).reshape(-1))
        cols.append(idx[nn].reshape(-1))
    return torch.stack([torch.cat(rows), torch.cat(cols)])


def global_max_pool(x, batch, size=None):
    return scatter_max(x, batch, dim_size=size)[0]


def global_mean_pool(x, batch, size=None):
    return scatter_mean(x, batch, dim_size=size)


def _inits_zeros(value):
    if value is not None:
        value.data.fill_(0.0)


# ---------------------------------------------------------------------------
# module wiring
# ---------------------------------------------------------------------------

def install():
    """Registers the shim modules in ``sys.modules`` (idempotent)."""
    if "torch_scatter" in sys.modules and hasattr(
            sys.modules["torch_scatter"], "_deltaconv_tpu_shim"):
        return

    ts = types.ModuleType("torch_scatter")
    ts.scatter = scatter
    ts.scatter_add = scatter_add
    ts.scatter_mean = scatter_mean
    ts.scatter_max = scatter_max
    ts._deltaconv_tpu_shim = True

    tsp = types.ModuleType("torch_sparse")
    tsp.SparseTensor = SparseTensor
    tsp._deltaconv_tpu_shim = True

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.knn_graph = knn_graph
    tg_nn.global_max_pool = global_max_pool
    tg_nn.global_mean_pool = global_mean_pool
    tg_inits = types.ModuleType("torch_geometric.nn.inits")
    tg_inits.zeros = _inits_zeros
    tg_nn.inits = tg_inits
    tg.nn = tg_nn
    tg._deltaconv_tpu_shim = True

    bindings = types.ModuleType("deltaconv_bindings")

    def _no_bindings(*_, **__):
        raise RuntimeError("deltaconv_bindings is a shim: the reference "
                           "C++ sampling module is not built here")

    bindings.geodesicFPS = _no_bindings

    sys.modules["torch_scatter"] = ts
    sys.modules["torch_sparse"] = tsp
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.inits"] = tg_inits
    sys.modules["deltaconv_bindings"] = bindings


def load_reference(path: str = REFERENCE_PATH):
    """Installs the shims and imports the read-only reference package.

    Returns the imported ``deltaconv`` module (the upstream one — our
    framework package is ``deltaconv_tpu``, so there is no name clash).
    """
    install()
    if path not in sys.path:
        sys.path.insert(0, path)
    import deltaconv  # noqa: F401  (the reference package)

    return deltaconv


class Data:
    """Tiny stand-in for a torch_geometric ``Data`` batch: attribute
    bag with ``pos``/``batch``/``norm``/optional ``x``/``category``."""

    def __init__(self, **kwargs):
        for key, val in kwargs.items():
            setattr(self, key, val)
