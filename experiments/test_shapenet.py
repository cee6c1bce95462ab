"""Voting evaluation of a trained ShapeNet model.

Reference: /root/reference/experiments/test_shapenet.py — num_votes
(default 10) stochastic-augmented passes over the test set, summed
logits -> argmax, per-class IoU printout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from common import base_parser, finish_args
from train_shapenet import augment, build_datasets_and_classes, \
    shapenet_model


def build_parser():
    """CLI defaults per reference test_shapenet.py:117-146
    (batch_size 16 at :124, num_votes 10 at :126)."""
    parser = base_parser("DeltaNet ShapeNet voting evaluation (TPU)")
    parser.set_defaults(batch_size=16, num_points=2048, k=30)
    parser.add_argument("--class_choice", type=str, default=None)
    parser.add_argument("--num_votes", type=int, default=10,
                        help="Stochastic-augmented eval passes")
    return parser


def main():
    args = build_parser().parse_args()
    args = finish_args(args, "shapenet_test", "ShapeNet")
    if not args.checkpoint:
        raise SystemExit("--checkpoint is required for voting evaluation")

    from deltaconv_tpu.data import BatchLoader
    from deltaconv_tpu.training import (
        create_train_state, evaluate_voting, restore_any,
        sgd_momentum,
    )

    _, test_ds, num_classes = build_datasets_and_classes(args)
    test_loader = BatchLoader(test_ds, args.batch_size, shuffle=False,
                              drop_last=False)

    model = shapenet_model(args, num_classes)
    example = next(iter(test_loader))
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), (jnp.asarray(example["pos"]),),
        sgd_momentum(0.1),
        init_kwargs={
            "normal": jnp.asarray(example["normal"]),
            "category": jnp.asarray(example["category"]),
        },
    )
    state = restore_any(args.checkpoint, state, params_only=True)

    mean_iou, per_class = evaluate_voting(
        model, state, test_loader, augment, num_votes=args.num_votes,
        seed=args.seed, class_choice=args.class_choice,
    )
    print(f"Instance mIoU over {args.num_votes} votes: {mean_iou:.4f}")
    from deltaconv_tpu.data.shapenet import ShapeNet

    names = list(ShapeNet.category_ids.keys())
    for cat, iou in sorted(per_class.items()):
        print(f"  {names[cat]:<12s} {iou:.4f}")


if __name__ == "__main__":
    main()
