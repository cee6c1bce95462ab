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
           "import_torch_checkpoint", "unexpected_skips"]

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


# Wrapper keys under which released checkpoints commonly nest the
# actual weights (torch.save of {"model_state_dict": ..., "optimizer":
# ...} style training snapshots).
_WRAPPER_KEYS = ("state_dict", "model_state_dict", "model", "net")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Loads a torch checkpoint file into a flat dict of numpy arrays.

    Defensive against the checkpoint shapes found in the wild: a whole
    pickled ``nn.Module``, a raw ``state_dict``, or a training snapshot
    nesting the weights under ``state_dict``/``model_state_dict``/
    ``model``/``net``; ``DataParallel``'s ``module.`` prefix is
    stripped."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict):
        for key in _WRAPPER_KEYS:
            inner = sd.get(key)
            if hasattr(inner, "state_dict"):
                inner = inner.state_dict()
            if isinstance(inner, dict) and inner and all(
                    hasattr(v, "detach") for v in inner.values()):
                sd = inner
                break
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "detach"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


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


# Keys whose skipping is expected and harmless: BatchNorm step
# counters and VectorNonLin's bias, which is dead code when the layer
# is batch-normalized (reference nn/nonlin.py zeroes and never uses it
# with BN — every shipped model config).
_TOLERATED_SKIPS = re.compile(
    r"(\.num_batches_tracked$|\.v_mlp\.\d+\.1\.bias$)"
)


def unexpected_skips(skipped):
    """Filters a skipped-key list down to the genuinely unmatched ones
    (drops the tolerated BN counters / dead VectorNonLin biases)."""
    return [s for s in skipped if not _TOLERATED_SKIPS.search(s)]


def import_state_dict(state_dict: Dict[str, np.ndarray],
                      strict: bool = False):
    """Translates a reference state_dict into (params, batch_stats)
    pytrees (nested dicts of numpy arrays).

    With ``strict=True``, raises ``ValueError`` listing every key that
    did not map to a framework parameter (except the tolerated
    BatchNorm counters and dead VectorNonLin biases) — a silently
    partial import would evaluate with randomly initialized weights.
    Returns ``(params, batch_stats, skipped_keys)``."""
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
    if strict:
        unmatched = unexpected_skips(skipped)
        if unmatched:
            raise ValueError(
                "torch import left "
                f"{len(unmatched)}/{len(state_dict)} keys unmatched: "
                + ", ".join(unmatched[:20])
                + (" ..." if len(unmatched) > 20 else "")
            )
    return params, batch_stats, skipped


def import_torch_checkpoint(path: str, strict: bool = False):
    """Loads and translates a reference ``.pt``/``.pth`` state_dict,
    printing the skipped-keys diagnostic (a silently partial import
    would serve or evaluate missing weights) — or raising on it with
    ``strict=True``. The ONE torch-restore policy shared by
    ``training.checkpoint.restore_any`` and ``serving.load_variables``.
    Returns ``(params, batch_stats)``."""
    params, batch_stats, skipped = import_state_dict(
        load_torch_state_dict(path), strict=strict)
    noteworthy = unexpected_skips(skipped)
    if noteworthy:
        print(f"[torch import] skipped keys: {noteworthy}")
    return params, batch_stats
