"""ShapeNet part segmentation with DeltaConv on TPU.

Reference recipe (/root/reference/experiments/train_shapenet.py):
2048 points + normals, k=30, conv channels [64, 128, 256], mlp depth 2,
categorical one-hot head, trainval split, NO label smoothing, per-epoch
instance mIoU; train-time RandomScale(2/3, 3/2) +
RandomTranslateGlobal(0.2).
"""

import jax
import jax.numpy as jnp

from common import base_parser, finish_args, make_logger


# Reference recipe constants (train_shapenet.py:63-64,79-89,109).
RECIPE = {
    "conv_channels": (64, 128, 256),
    "mlp_depth": 2,
    "embedding_size": 1024,
    "categorical_vector": True,
    "optimizer": "sgd",
    "lr_scale": 100,
    "weight_decay": 1e-4,
    "schedule": "cosine",
    "smoothing": 0.0,
    "aug_scales": (2.0 / 3.0, 3.0 / 2.0),
    "aug_translate": 0.2,
}


def shapenet_model(args, num_classes):
    """Shared with test_shapenet.py (reference train_shapenet.py:77-89)."""
    from deltaconv_tpu.models import DeltaNetSegmentation

    return DeltaNetSegmentation(
        num_classes=num_classes,
        conv_channels=RECIPE["conv_channels"],
        mlp_depth=RECIPE["mlp_depth"],
        embedding_size=RECIPE["embedding_size"],
        categorical_vector=RECIPE["categorical_vector"],
        num_neighbors=args.k,
        grad_regularizer=args.grad_regularizer,
        grad_kernel_width=args.grad_kernel,
        operator_dtype=args.operator_dtype,
        knn_method=args.knn_method,
    )


def augment(key, batch):
    from deltaconv_tpu.transforms import (
        random_scale, random_translate_global,
    )

    k0, k1 = jax.random.split(key)
    pos, normal = batch["pos"], batch.get("normal")
    pos, normal = random_scale(k0, pos, normal, (2.0 / 3.0, 3.0 / 2.0))
    pos = random_translate_global(k1, pos, 0.2)
    out = dict(batch)
    out["pos"] = pos
    if normal is not None:
        out["normal"] = normal
    return out


def build_datasets_and_classes(args):
    from deltaconv_tpu.data import ShapeNet
    from deltaconv_tpu.transforms import Compose, GeodesicFPS, NormalizeScale

    pre = Compose([
        NormalizeScale(),
        GeodesicFPS(args.num_points, seed=args.seed),
    ])
    train_ds = ShapeNet(args.data_root, categories=args.class_choice,
                        split="trainval", pre_transform=pre)
    test_ds = ShapeNet(args.data_root, categories=args.class_choice,
                       split="test", pre_transform=pre)
    if args.class_choice is None:
        num_classes = train_ds.num_classes
    else:
        num_classes = len(train_ds.seg_classes[args.class_choice])
    return train_ds, test_ds, num_classes


def build_parser():
    """CLI defaults per reference train_shapenet.py:166-200
    (batch_size 16 at :169 — smaller than the classification 32)."""
    parser = base_parser("DeltaNet ShapeNet part segmentation (TPU)")
    parser.set_defaults(batch_size=16, num_points=2048, k=30, epochs=200)
    parser.add_argument("--class_choice", type=str, default=None,
                        help="Train on a single shape category")
    return parser


def main():
    args = build_parser().parse_args()
    args = finish_args(args, "shapenet", "ShapeNet")

    from deltaconv_tpu.data import BatchLoader
    from deltaconv_tpu.training import (
        FitConfig, cosine_epoch_schedule, create_train_state,
        evaluate_segmentation, fit, restore_any, sgd_momentum,
    )

    train_ds, test_ds, num_classes = build_datasets_and_classes(args)
    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                               seed=args.seed)
    test_loader = BatchLoader(test_ds, args.batch_size, shuffle=False,
                              drop_last=False)

    model = shapenet_model(args, num_classes)
    example = next(iter(train_loader))
    schedule = cosine_epoch_schedule(
        100 * args.lr, args.epochs, len(train_loader), eta_min=args.lr
    )
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), (jnp.asarray(example["pos"]),),
        sgd_momentum(schedule, args.momentum, weight_decay=1e-4),
        init_kwargs={
            "normal": jnp.asarray(example["normal"]),
            "category": jnp.asarray(example["category"]),
        },
    )

    logger, ckpt_dir = make_logger(args)
    eval_fn = lambda s: evaluate_segmentation(
        model, s, test_loader, class_choice=args.class_choice
    )
    if args.evaluating:
        state = restore_any(args.checkpoint, state)
    else:
        config = FitConfig(epochs=args.epochs, seed=args.seed,
                           smoothing=RECIPE["smoothing"],
                           data_parallel=not args.no_data_parallel)
        state = fit(model, state, train_loader, test_loader, config,
                    logger=logger, checkpoint_dir=ckpt_dir, augment=augment,
                    resume=bool(args.resume),
                    per_point=True, eval_fn=eval_fn)
    scalars = eval_fn(state)
    print("Test accuracy: {test accuracy}, mIoU: {test mIoU}".format(
        **scalars))


if __name__ == "__main__":
    main()
