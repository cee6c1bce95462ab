"""SHREC-11 classification with DeltaConv on TPU.

Reference recipe (/root/reference/experiments/train_shrec.py): 30
classes, conv channels [32]x4, 2048 points, full 3-axis random-rotation
augmentation + global translate, label smoothing on, batch 16,
100 epochs. The paper averages over 10 reprocessed runs
(replication_scripts/shrec.sh).
"""

import jax
import jax.numpy as jnp

from common import base_parser, finish_args, make_logger


def augment(key, batch):
    from deltaconv_tpu.transforms import (
        random_rotate, random_translate_global,
    )

    k0, k1, k2, k3 = jax.random.split(key, 4)
    pos, normal = batch["pos"], batch.get("normal")
    pos, normal = random_rotate(k0, pos, normal, 360, axis=0)
    pos, normal = random_rotate(k1, pos, normal, 360, axis=1)
    pos, normal = random_rotate(k2, pos, normal, 360, axis=2)
    pos = random_translate_global(k3, pos, 0.1)
    out = dict(batch)
    out["pos"] = pos
    if normal is not None:
        out["normal"] = normal
    return out


# Reference recipe constants (train_shrec.py:62,70-71,102).
RECIPE = {
    "num_classes": 30,
    "conv_channels": (32, 32, 32, 32),
    "optimizer": "sgd",
    "lr_scale": 100,
    "weight_decay": 1e-4,
    "schedule": "cosine",
    "smoothing": 0.2,
    "aug_translate": 0.1,
}


def build_parser():
    """CLI defaults per reference train_shrec.py:144-178."""
    parser = base_parser("DeltaNet SHREC classification (TPU)")
    parser.set_defaults(batch_size=16, epochs=100, num_points=2048)
    parser.add_argument("--split_seed", type=int, default=None,
                        help="Seed of the random 10-per-class split")
    return parser


def main():
    args = build_parser().parse_args()
    args = finish_args(args, "shrec", "SHREC")

    from deltaconv_tpu.data import SHREC, BatchLoader
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.training import (
        FitConfig, cosine_epoch_schedule, create_train_state,
        evaluate_classification, fit, restore_any, sgd_momentum,
    )
    from deltaconv_tpu.transforms import (
        Compose, GeodesicFPS, NormalizeScale, SamplePoints,
    )

    pre = Compose([
        NormalizeScale(),
        SamplePoints(args.num_points * args.sampling_margin,
                     include_normals=True, seed=args.seed),
        GeodesicFPS(args.num_points, seed=args.seed),
    ])
    train_ds = SHREC(args.data_root, split="train", pre_transform=pre,
                     split_seed=args.split_seed)
    test_ds = SHREC(args.data_root, split="test", pre_transform=pre,
                    split_seed=args.split_seed)
    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                               seed=args.seed)
    test_loader = BatchLoader(test_ds, args.batch_size, shuffle=False,
                              drop_last=False)

    model = DeltaNetClassification(
        num_classes=RECIPE["num_classes"],
        conv_channels=RECIPE["conv_channels"],
        num_neighbors=args.k,
        grad_regularizer=args.grad_regularizer,
        grad_kernel_width=args.grad_kernel,
        operator_dtype=args.operator_dtype,
        knn_method=args.knn_method,
    )
    example = next(iter(train_loader))
    schedule = cosine_epoch_schedule(
        100 * args.lr, args.epochs, len(train_loader), eta_min=args.lr
    )
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), (jnp.asarray(example["pos"]),),
        sgd_momentum(schedule, args.momentum, weight_decay=1e-4),
        init_kwargs={"normal": jnp.asarray(example["normal"])},
    )

    logger, ckpt_dir = make_logger(args)
    if args.evaluating:
        state = restore_any(args.checkpoint, state)
    else:
        config = FitConfig(epochs=args.epochs, seed=args.seed,
                           smoothing=RECIPE["smoothing"],
                           data_parallel=not args.no_data_parallel)
        state = fit(model, state, train_loader, test_loader, config,
                    logger=logger, checkpoint_dir=ckpt_dir, augment=augment,
                    resume=bool(args.resume))
    scalars = evaluate_classification(model, state, test_loader)
    print("Test accuracy: {test accuracy}".format(**scalars))


if __name__ == "__main__":
    main()
