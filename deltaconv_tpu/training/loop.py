"""High-level training / evaluation loops.

The framework-level equivalent of the reference's per-script train /
train_epoch / evaluate trios (e.g. train_modelnet.py:20-143), shared by
every experiment CLI:

* one jitted train step (operator build + forward + backward + update),
* optional on-device batched augmentation folded in front of the step,
* data parallelism over all local devices via the ``parallel`` mesh,
* epoch-level eval, TensorBoard/JSONL logging, periodic orbax
  checkpoints (with optimizer state — the reference saves weights only).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh, shard_train_step
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .logging import MetricsLogger
from .metrics import accuracy, balanced_accuracy, shape_iou
from .steps import make_eval_step, make_train_step
from .train_state import TrainState, create_train_state

__all__ = ["FitConfig", "fit", "evaluate_classification",
           "evaluate_segmentation", "evaluate_voting"]


@dataclasses.dataclass
class FitConfig:
    epochs: int = 250
    seed: int = 1
    smoothing: float = 0.2
    checkpoint_every: int = 50
    data_parallel: bool = True
    log_every: int = 50


def _device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def fit(model, state: TrainState, train_loader, test_loader,
        config: FitConfig, logger: Optional[MetricsLogger] = None,
        checkpoint_dir: Optional[str] = None,
        augment: Optional[Callable] = None, per_point: bool = False,
        eval_fn: Optional[Callable] = None, resume: bool = False):
    """Runs the full training loop; returns the final state.

    Args:
      model: flax module.
      state: initial TrainState (see ``create_train_state``).
      train_loader / test_loader: BatchLoader-compatible iterables.
      config: loop hyperparameters.
      logger: MetricsLogger (or None for silent).
      checkpoint_dir: where periodic + final checkpoints go.
      augment: optional jittable ``(key, batch) -> batch`` on-device
        augmentation.
      per_point: segmentation-style labels.
      eval_fn: ``(state) -> dict`` of scalars logged per epoch; default
        classification accuracy over ``test_loader``.
      resume: restore the latest checkpoint under ``checkpoint_dir``
        (full state, optimizer included) and continue from the next
        epoch. Per-epoch RNG and shuffle orders are derived from
        ``(seed, epoch)``, so an interrupted-then-resumed run follows
        the exact trajectory of an uninterrupted one (checkpoints land
        on epoch boundaries; mid-epoch progress since the last one is
        re-trained). A no-op when no checkpoint exists yet.
    """
    logger = logger or MetricsLogger(None)
    start_epoch = 1
    if resume and checkpoint_dir:
        last = latest_step(checkpoint_dir)
        if last is not None:
            state = restore_checkpoint(checkpoint_dir, state, step=last)
            start_epoch = last + 1
    train_step = make_train_step(model, smoothing=config.smoothing,
                                 per_point=per_point)
    if config.data_parallel and len(jax.devices()) > 1:
        train_step = shard_train_step(train_step, make_mesh())
    aug_fn = jax.jit(augment) if augment is not None else None

    if eval_fn is None:
        if per_point:
            eval_fn = lambda s: evaluate_segmentation(model, s, test_loader)
        else:
            eval_fn = lambda s: evaluate_classification(model, s, test_loader)

    step_idx = int(state.step)
    # Metrics stay DEVICE arrays inside the epoch (a float() per step
    # would block the host every step, serializing the input pipeline
    # against device compute); they are fetched once per log window /
    # epoch.
    loss_window = []
    for epoch in range(start_epoch, config.epochs + 1):
        # Per-epoch streams are pure functions of (seed, epoch) so a
        # resumed run reproduces the uninterrupted trajectory.
        rng = jax.random.fold_in(jax.random.PRNGKey(config.seed), epoch)
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        accs = []
        for batch in train_loader:
            batch = _device_batch(batch)
            if aug_fn is not None:
                rng, key = jax.random.split(rng)
                batch = aug_fn(key, batch)
            rng, key = jax.random.split(rng)
            state, metrics = train_step(state, batch, key)
            step_idx += 1
            loss_window.append(metrics["loss"])
            if step_idx % config.log_every == 0:
                logger.add_scalar(
                    "training loss",
                    float(np.mean(jax.device_get(loss_window))), step_idx)
                loss_window = []
            accs.append(metrics["accuracy"])
        logger.add_scalar("training accuracy",
                          float(np.mean(jax.device_get(accs))), epoch)

        scalars = eval_fn(state)
        for tag, value in scalars.items():
            logger.add_scalar(tag, value, epoch)

        if checkpoint_dir and epoch % config.checkpoint_every == 0:
            save_checkpoint(checkpoint_dir, state, step=epoch)

    if checkpoint_dir:
        save_checkpoint(checkpoint_dir, state, step=config.epochs)
    return state


def evaluate_classification(model, state, loader) -> dict:
    """Overall + mean-class accuracy (reference evaluate,
    train_modelnet.py:124-143)."""
    eval_step = make_eval_step(model)
    preds, trues = [], []
    for batch in loader:
        batch = _device_batch(batch)
        logits = eval_step(state, batch)
        preds.append(np.argmax(np.asarray(logits), axis=-1))
        trues.append(np.asarray(batch["label"]))
    pred = np.concatenate(preds)
    true = np.concatenate(trues)
    return {
        "test accuracy": accuracy(pred, true),
        "test mean class accuracy": balanced_accuracy(pred, true),
    }


def evaluate_segmentation(model, state, loader,
                          class_choice: Optional[str] = None,
                          with_iou: bool = True) -> dict:
    """Per-point accuracy (+ ShapeNet instance mIoU when category
    one-hots are present)."""
    eval_step = make_eval_step(model, per_point=True)
    preds, trues, cats = [], [], []
    for batch in loader:
        batch = _device_batch(batch)
        logits = eval_step(state, batch)
        preds.append(np.argmax(np.asarray(logits), axis=-1))
        trues.append(np.asarray(batch["label"]))
        if "category" in batch:
            cats.append(np.argmax(np.asarray(batch["category"]), axis=-1))
    pred = np.concatenate(preds)
    true = np.concatenate(trues)
    out = {"test accuracy": accuracy(pred, true)}
    if with_iou and cats:
        ious = shape_iou(pred, true, np.concatenate(cats), class_choice)
        out["test mIoU"] = float(np.mean(ious))
    return out


def evaluate_voting(model, state, loader, augment, num_votes: int = 10,
                    seed: int = 0, class_choice: Optional[str] = None):
    """Voting evaluation: ``num_votes`` stochastic-augmented passes,
    summed logits, argmax (reference test_shapenet.py:79-96).

    Returns ``(mean_iou, per_class_iou dict)`` for segmentation loaders
    with categories, else overall accuracy.
    """
    eval_step = make_eval_step(model, per_point=True)
    aug_fn = jax.jit(augment) if augment is not None else None
    rng = jax.random.PRNGKey(seed)

    logits_sum, trues, cats = [], [], []
    for v in range(num_votes):
        batch_logits, vote_labels = [], []
        for i, batch in enumerate(loader):
            batch = _device_batch(batch)
            vote_labels.append(np.asarray(batch["label"]))
            if aug_fn is not None:
                rng, key = jax.random.split(rng)
                batch = aug_fn(key, batch)
            batch_logits.append(np.asarray(eval_step(state, batch)))
            if v == 0:
                trues.append(vote_labels[-1])
                if "category" in batch:
                    cats.append(
                        np.argmax(np.asarray(batch["category"]), axis=-1)
                    )
        stacked = np.concatenate(batch_logits)
        if v > 0 and (len(vote_labels) != len(trues) or not all(
                np.array_equal(a, b) for a, b in zip(vote_labels, trues))):
            # Votes sum POSITIONALLY across loader passes: a loader that
            # reshuffles between iterations would silently add cloud A's
            # logits into cloud B's slot.
            raise ValueError(
                "evaluate_voting: the loader yielded a different sample "
                "order on vote %d — disable shuffling (or pin the "
                "loader's epoch) for voting evaluation" % v)
        logits_sum = stacked if v == 0 else logits_sum + stacked

    pred = np.argmax(logits_sum, axis=-1)
    true = np.concatenate(trues)
    if cats:
        cat = np.concatenate(cats)
        ious = np.asarray(shape_iou(pred, true, cat, class_choice))
        per_class = {}
        for c in np.unique(cat):
            per_class[int(c)] = float(np.mean(ious[cat == c]))
        return float(np.mean(ious)), per_class
    return accuracy(pred, true), {}
