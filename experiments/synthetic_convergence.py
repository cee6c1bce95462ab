"""Seeded synthetic train-to-convergence evidence.

Trains the flagship classification architecture (reference channels
[64, 64, 128, 256], SGD momentum + cosine — train_modelnet.py:67-68
semantics) on the deterministic class-conditioned synthetic shapes
(deltaconv_tpu/data/synthetic.py) until held-out accuracy reaches a
target. The strongest accuracy evidence available without network
access to the real datasets: the full operator-build + conv + head
pipeline must LEARN, not just run.

Curves go to ``<logdir>/metrics.jsonl`` via MetricsLogger; the final
line of stdout is a JSON summary. A committed reference run lives at
``experiments/convergence_runs/``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def build_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--train_size", type=int, default=64)
    p.add_argument("--eval_size", type=int, default=64)
    p.add_argument("--num_points", type=int, default=128)
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--target", type=float, default=0.99)
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--task", choices=("cls", "seg"), default="cls",
                   help="cls: DeltaNetClassification on class-"
                        "conditioned shapes; seg: DeltaNetSegmentation "
                        "on per-point height-band parts")
    p.add_argument("--eval_precisions", type=str, default="",
                   help="comma list of serving precisions (bfloat16,"
                        "int8) to re-evaluate the TRAINED model in — "
                        "accuracy evidence for the reduced-precision "
                        "modes on learned weights, not random init")
    return p.parse_args(argv)


def _precision_evals(args, model, state, eval_loader, evaluate):
    """Re-evaluates the trained ``state`` under each requested serving
    precision (serving.apply_precision clones)."""
    from deltaconv_tpu.serving import apply_precision

    extras = {}
    for prec in filter(None, args.eval_precisions.split(",")):
        scalars = evaluate(apply_precision(model, prec), state,
                           eval_loader)
        extras[f"accuracy_{prec}"] = round(scalars["test accuracy"], 4)
    return extras


class _List:
    def __init__(self, c):
        self.c = c

    def __len__(self):
        return len(self.c)

    def __getitem__(self, i):
        return self.c[i]


def run_seg(args):
    """Segmentation variant: the reference's ShapeNet architecture
    (conv [64, 128, 256], mlp_depth 2, categorical vector stream —
    train_shapenet.py:180) trained to per-point accuracy on the
    height-band parts of the synthetic shapes."""
    import jax
    import jax.numpy as jnp

    from deltaconv_tpu.data import BatchLoader, Cloud
    from deltaconv_tpu.data.synthetic import synthetic_seg_shapes
    from deltaconv_tpu.models import DeltaNetSegmentation
    from deltaconv_tpu.parallel import make_mesh, shard_train_step
    from deltaconv_tpu.training import (
        MetricsLogger,
        cosine_epoch_schedule,
        create_train_state,
        evaluate_segmentation,
        make_train_step,
        sgd_momentum,
    )

    num_parts, num_categories = args.num_classes, 16

    def dataset(seed, count):
        rng = np.random.default_rng(seed)
        pos, normal, label, cats = synthetic_seg_shapes(
            rng, count, args.num_points, num_parts)
        out = []
        for i in range(count):
            onehot = np.zeros((num_categories,), np.float32)
            onehot[cats[i]] = 1.0
            out.append(Cloud(pos=pos[i], normal=normal[i],
                             y=label[i].astype(np.int64),
                             category=onehot))
        return out

    train_loader = BatchLoader(_List(dataset(args.seed, args.train_size)),
                               args.batch_size, shuffle=True,
                               seed=args.seed)
    eval_loader = BatchLoader(_List(dataset(args.seed + 1000,
                                            args.eval_size)),
                              args.batch_size, drop_last=False)

    model = DeltaNetSegmentation(
        num_classes=num_parts,
        conv_channels=(64, 128, 256),
        mlp_depth=2,
        categorical_vector=True,
        num_neighbors=args.k,
    )
    example = next(iter(train_loader))
    schedule = cosine_epoch_schedule(args.lr, args.epochs,
                                     len(train_loader),
                                     eta_min=args.lr * 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        (jnp.asarray(example["pos"]),), sgd_momentum(schedule),
        init_kwargs={"normal": jnp.asarray(example["normal"]),
                     "category": jnp.asarray(example["category"])},
    )

    step = make_train_step(model, smoothing=0.2, per_point=True)
    if len(jax.devices()) > 1:
        step = shard_train_step(step, make_mesh())

    logger = MetricsLogger(args.logdir)
    rng = jax.random.PRNGKey(args.seed)
    best, hit_epoch, step_idx = 0.0, None, 0
    for epoch in range(1, args.epochs + 1):
        losses = []
        for batch in train_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, key = jax.random.split(rng)
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
            step_idx += 1
        logger.add_scalar("training loss", float(np.mean(losses)),
                          step_idx)
        scalars = evaluate_segmentation(model, state, eval_loader)
        acc = scalars["test accuracy"]
        logger.add_scalar("test accuracy", acc, epoch)
        if "test mIoU" in scalars:
            logger.add_scalar("test mIoU", scalars["test mIoU"], epoch)
        print(f"epoch {epoch:3d}  loss {np.mean(losses):.4f}  "
              f"eval per-point acc {acc:.4f}", flush=True)
        best = max(best, acc)
        if acc >= args.target:
            hit_epoch = epoch
            break

    extras = _precision_evals(args, model, state, eval_loader,
                              evaluate_segmentation)
    print(json.dumps({
        "task": "seg",
        "converged": hit_epoch is not None,
        "epochs": hit_epoch if hit_epoch is not None else args.epochs,
        "best_accuracy": round(best, 4),
        "target": args.target,
        **extras,
    }))
    return best, hit_epoch, extras


def run(args):
    if getattr(args, "task", "cls") == "seg":
        return run_seg(args)

    import jax
    import jax.numpy as jnp

    from deltaconv_tpu.data import BatchLoader, Cloud
    from deltaconv_tpu.data.synthetic import synthetic_shapes
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.parallel import make_mesh, shard_train_step
    from deltaconv_tpu.training import (
        MetricsLogger,
        cosine_epoch_schedule,
        create_train_state,
        evaluate_classification,
        make_train_step,
        sgd_momentum,
    )

    def dataset(seed, count):
        rng = np.random.default_rng(seed)
        pos, normal, labels = synthetic_shapes(
            rng, count, args.num_points, args.num_classes)
        return [Cloud(pos=pos[i], normal=normal[i],
                      y=np.int64(labels[i])) for i in range(count)]

    train_loader = BatchLoader(_List(dataset(args.seed, args.train_size)),
                               args.batch_size, shuffle=True,
                               seed=args.seed)
    eval_loader = BatchLoader(_List(dataset(args.seed + 1000,
                                            args.eval_size)),
                              args.batch_size, drop_last=False)

    model = DeltaNetClassification(
        num_classes=args.num_classes,
        conv_channels=(64, 64, 128, 256),
        num_neighbors=args.k,
    )
    example = next(iter(train_loader))
    schedule = cosine_epoch_schedule(args.lr, args.epochs,
                                     len(train_loader),
                                     eta_min=args.lr * 0.01)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        (jnp.asarray(example["pos"]),), sgd_momentum(schedule),
        init_kwargs={"normal": jnp.asarray(example["normal"])},
    )

    step = make_train_step(model, smoothing=0.2)
    if len(jax.devices()) > 1:
        step = shard_train_step(step, make_mesh())

    logger = MetricsLogger(args.logdir)
    rng = jax.random.PRNGKey(args.seed)
    best, hit_epoch, step_idx = 0.0, None, 0
    for epoch in range(1, args.epochs + 1):
        losses = []
        for batch in train_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, key = jax.random.split(rng)
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
            step_idx += 1
        logger.add_scalar("training loss", float(np.mean(losses)),
                          step_idx)
        scalars = evaluate_classification(model, state, eval_loader)
        acc = scalars["test accuracy"]
        logger.add_scalar("test accuracy", acc, epoch)
        logger.add_scalar(
            "test mean class accuracy",
            scalars["test mean class accuracy"], epoch)
        print(f"epoch {epoch:3d}  loss {np.mean(losses):.4f}  "
              f"eval acc {acc:.4f}", flush=True)
        best = max(best, acc)
        if acc >= args.target:
            hit_epoch = epoch
            break

    extras = _precision_evals(args, model, state, eval_loader,
                              evaluate_classification)
    print(json.dumps({
        "converged": hit_epoch is not None,
        "epochs": hit_epoch if hit_epoch is not None else args.epochs,
        "best_accuracy": round(best, 4),
        "target": args.target,
        **extras,
    }))
    return best, hit_epoch, extras


if __name__ == "__main__":
    run(build_args())
