"""flax -> PyTorch state_dict exporter (inverse of torch_import).

Produces a ``state_dict`` in the UPSTREAM release's key layout
(reference module tree, SURVEY.md §2.3-2.4: ``deltanet_base.convs.{i}.
s_mlp_max.{j}.0.weight`` etc.) from this framework's params/batch_stats
pytrees. Two uses:

* the offline replication rehearsal
  (``replication_scripts/offline_rehearsal.py``): synthesize a
  release-shaped ``.pt`` checkpoint and drive the EXACT pretrained-eval
  code path (CLI ``--checkpoint x.pt`` -> ``restore_any`` ->
  ``import_torch_checkpoint``) without network access;
* round-trip tests of the importer (tests/utils/test_torch_import.py).

The import direction is independently pinned against the EXECUTED
upstream model (tests/utils/test_torch_import.py
``test_executed_reference_checkpoint_forms``); this exporter only has
to be its exact inverse.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["export_torch_state_dict"]

_BN_LEAF = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _torch_name(path, head: str) -> str:
    """One framework tree path -> the reference state_dict key."""
    parts = list(path)
    torch_parts = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("conv") and p[4:].isdigit():
            torch_parts.append(f"convs.{p[4:]}")
        elif (p.startswith("lin") and p[3:].isdigit()
              and parts[i + 1] == "kernel"):
            # lin{j}/kernel -> {j}.0.weight (Seq(Seq(Lin, BN, act)))
            torch_parts.append(f"{p[3:]}.0.weight")
            i += 2
            continue
        elif p.startswith("bn") and p[2:].isdigit():
            # bn{j}/BatchNorm_0/{leaf} -> {j}.1.bn.{torch leaf}
            torch_parts.append(f"{p[2:]}.1.bn.{_BN_LEAF[parts[i + 2]]}")
            i += 3
            continue
        elif p.startswith("nonlin") and p[6:].isdigit():
            # nonlin{j}/bn/BatchNorm_0/{leaf} (VectorNonLin)
            torch_parts.append(
                f"{p[6:]}.1.batchnorm.bn.{_BN_LEAF[parts[i + 3]]}")
            i += 4
            continue
        elif p == "kernel":
            torch_parts.append("weight")
        elif p == "bias":
            torch_parts.append("bias")
        else:
            torch_parts.append(p)
        i += 1
    name = ".".join(torch_parts)
    if head == "classification":
        name = name.replace("head0.", "classification_head.0.")
        name = name.replace("head1.", "classification_head.2.")
        name = name.replace("head_out.", "classification_head.4.")
    else:
        name = name.replace("head0.", "segmentation_head.0.")
        name = name.replace("head1.", "segmentation_head.2.")
        name = name.replace("head2.", "segmentation_head.4.")
        name = name.replace("head_out.", "segmentation_head.6.")
    return name


def export_torch_state_dict(params, batch_stats,
                            head: str = "classification"
                            ) -> Dict[str, np.ndarray]:
    """params/batch_stats pytrees -> a reference-layout flat
    state_dict of numpy arrays (``head``: "classification" |
    "segmentation" — selects the head Sequential's positional names).
    Linear kernels are transposed back to torch's ``[out, in]``."""
    if head not in ("classification", "segmentation"):
        raise ValueError(f"unknown head '{head}'")
    sd: Dict[str, np.ndarray] = {}
    for tree in (params, batch_stats):
        for path, arr in _flatten(tree).items():
            name = _torch_name(path, head)
            arr = np.asarray(arr)
            if (name.endswith("weight") and arr.ndim == 2
                    and ".bn." not in name and "batchnorm" not in name):
                arr = arr.T  # flax [in, out] -> torch [out, in]
            sd[name] = arr
    return sd
