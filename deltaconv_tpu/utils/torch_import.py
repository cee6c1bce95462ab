"""PyTorch -> flax weight importer for pretrained DeltaConv checkpoints.

Translates reference ``state_dict`` keys (module tree per SURVEY.md
§2.3-2.4, e.g. ``deltanet_base.convs.0.s_mlp_max.0.0.weight``) into
this framework's parameter/batch-stats pytrees so the upstream release
checkpoints evaluate without retraining.

Conventions handled:
  * torch ``Linear.weight`` is ``[out, in]`` -> flax ``kernel``
    ``[in, out]`` (transposed);
  * torch ``BatchNorm1d`` weight/bias/running_mean/running_var ->
    flax ``scale``/``bias`` params + ``mean``/``var`` batch stats;
  * reference MLPs are ``Seq(Seq(Lin, BN, act))`` -> our
    ``lin{j}``/``bn{j}``; VectorMLP layers are
    ``Seq(Lin, VectorNonLin(batchnorm=BN))`` -> ``lin{j}``/
    ``nonlin{j}/bn`` (the VectorNonLin ``bias`` parameter is unused
    when batch-normalized and is skipped);
  * head Sequentials map positionally (classification: 0->head0,
    2->head1, 4->head_out; segmentation: 0->head0, 2->head1,
    4->head2, 6->head_out).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "import_state_dict",
           "import_torch_checkpoint"]

_HEAD_RENAMES = [
    # order matters: longest prefixes first
    (re.compile(r"^classification_head\.0\."), "head0."),
    (re.compile(r"^classification_head\.2\."), "head1."),
    (re.compile(r"^classification_head\.4\."), "head_out."),
    (re.compile(r"^segmentation_head\.0\."), "head0."),
    (re.compile(r"^segmentation_head\.2\."), "head1."),
    (re.compile(r"^segmentation_head\.4\."), "head2."),
    (re.compile(r"^segmentation_head\.6\."), "head_out."),
    (re.compile(r"^deltanet_base\.convs\.(\d+)\."), r"deltanet_base.conv\1."),
]

_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch checkpoint file into a dict of numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items() if hasattr(v, "detach")}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _translate(key: str):
    """Returns ('params'|'batch_stats'|None, path tuple) for one key."""
    for pat, repl in _HEAD_RENAMES:
        key = pat.sub(repl, key)

    if key.endswith("num_batches_tracked"):
        return None, ()

    parts = key.split(".")

    # Plain final Linear heads: head_out.weight / head2.weight.
    if len(parts) == 2 and parts[-1] in ("weight", "bias"):
        name = "kernel" if parts[-1] == "weight" else "bias"
        return "params", (parts[0], name)

    # Walk structural indices.
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("s_mlp_max", "s_mlp", "lin_embedding", "lin_global",
                 "lin_categorical", "head0", "head1") or (
                     p.startswith("conv") or p == "deltanet_base"):
            out.append(p)
            i += 1
            continue
        if p == "v_mlp":
            # v_mlp.{j}.{0|1}...
            j = parts[i + 1]
            sub = parts[i + 2]
            if sub == "0":  # Linear
                return "params", tuple(out) + (
                    "v_mlp", f"lin{j}", "kernel"
                )
            if sub == "1":
                leaf = parts[-1]
                if leaf == "bias" and parts[i + 3] == "bias":
                    return None, ()  # unused VectorNonLin bias
                # v_mlp.{j}.1.batchnorm.bn.{leaf}
                if leaf in _BN_PARAM:
                    return "params", tuple(out) + (
                        "v_mlp", f"nonlin{j}", "bn", "BatchNorm_0",
                        _BN_PARAM[leaf],
                    )
                if leaf in _BN_STAT:
                    return "batch_stats", tuple(out) + (
                        "v_mlp", f"nonlin{j}", "bn", "BatchNorm_0",
                        _BN_STAT[leaf],
                    )
            return None, ()
        if p.isdigit():
            # MLP layer index j followed by 0 (Lin) or 1 (BN wrapper).
            j = p
            sub = parts[i + 1]
            leaf = parts[-1]
            if sub == "0" and leaf == "weight":
                return "params", tuple(out) + (f"lin{j}", "kernel")
            if sub == "1":
                if leaf in _BN_PARAM:
                    return "params", tuple(out) + (
                        f"bn{j}", "BatchNorm_0", _BN_PARAM[leaf]
                    )
                if leaf in _BN_STAT:
                    return "batch_stats", tuple(out) + (
                        f"bn{j}", "BatchNorm_0", _BN_STAT[leaf]
                    )
            return None, ()
        # Unrecognized segment.
        return None, ()
    return None, ()


def import_state_dict(state_dict: Dict[str, np.ndarray]):
    """Translates a reference state_dict into (params, batch_stats)
    pytrees (nested dicts of numpy arrays)."""
    params: dict = {}
    batch_stats: dict = {}
    skipped = []
    for key, value in state_dict.items():
        coll, path = _translate(key)
        if coll is None:
            skipped.append(key)
            continue
        if path[-1] == "kernel" and value.ndim == 2:
            value = value.T  # torch [out, in] -> flax [in, out]
        _set(params if coll == "params" else batch_stats, path,
             np.asarray(value))
    return params, batch_stats, skipped


def import_torch_checkpoint(path: str):
    """Loads and translates a reference ``.pt``/``.pth`` state_dict,
    printing the skipped-keys diagnostic (a silently partial import
    would serve or evaluate missing weights). The ONE torch-restore
    policy shared by ``training.checkpoint.restore_any`` and
    ``serving.load_variables``. Returns ``(params, batch_stats)``."""
    params, batch_stats, skipped = import_state_dict(
        load_torch_state_dict(path))
    noteworthy = [s for s in skipped if "num_batches_tracked" not in s]
    if noteworthy:
        print(f"[torch import] skipped keys: {noteworthy}")
    return params, batch_stats
