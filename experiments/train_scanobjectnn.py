"""ScanObjectNN real-scan classification with DeltaConv on TPU.

Reference recipe (/root/reference/experiments/train_scanobjectnn.py):
15 classes, conv channels [64, 64, 64, 128], default lambda 0.01,
1024 points, bg/nobg x 5 perturbation variants; train-time
RandomRotate(360, axis=1) + per-point jitter (0.01) + RandomScale(4/5,
5/4) + RandomTranslateGlobal(0.1).
"""

import jax
import jax.numpy as jnp

from common import base_parser, finish_args, make_logger


def augment(key, batch):
    from deltaconv_tpu.transforms import (
        random_rotate, random_scale, random_translate_global,
    )

    k0, k1, k2, k3 = jax.random.split(key, 4)
    pos, normal = batch["pos"], batch.get("normal")
    pos, normal = random_rotate(k0, pos, normal, 360, axis=1)
    # PyG RandomTranslate(0.01): independent per-point jitter.
    pos = pos + jax.random.uniform(k1, pos.shape, minval=-0.01,
                                   maxval=0.01, dtype=pos.dtype)
    pos, normal = random_scale(k2, pos, normal, (4.0 / 5.0, 5.0 / 4.0))
    pos = random_translate_global(k3, pos, 0.1)
    out = dict(batch)
    out["pos"] = pos
    if normal is not None:
        out["normal"] = normal
    return out


# Reference recipe constants (train_scanobjectnn.py:72,80-81,112).
RECIPE = {
    "num_classes": 15,
    "conv_channels": (64, 64, 64, 128),
    "optimizer": "sgd",
    "lr_scale": 100,
    "weight_decay": 1e-4,
    "schedule": "cosine",
    "smoothing": 0.2,
    "aug_jitter": 0.01,
    "aug_scales": (4.0 / 5.0, 5.0 / 4.0),
    "aug_translate": 0.1,
}


def build_parser():
    """CLI defaults per reference train_scanobjectnn.py:156-196."""
    parser = base_parser("DeltaNet ScanObjectNN classification (TPU)")
    parser.set_defaults(num_points=1024, grad_regularizer=0.01)
    parser.add_argument("--background", action="store_true",
                        help="Use the variant with backgrounds")
    parser.add_argument("--augmentation", type=str, default=None,
                        choices=[None, "PB_T25", "PB_T25_R", "PB_T50_R",
                                 "PB_T50_RS"],
                        help="Perturbation variant (default: None)")
    return parser


def main():
    args = build_parser().parse_args()
    args = finish_args(args, "scanobjectnn", "ScanObjectNN")

    from deltaconv_tpu.data import BatchLoader, ScanObjectNN
    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.training import (
        FitConfig, cosine_epoch_schedule, create_train_state,
        evaluate_classification, fit, restore_any, sgd_momentum,
    )
    from deltaconv_tpu.transforms import GeodesicFPS

    pre = GeodesicFPS(args.num_points, seed=args.seed)
    train_ds = ScanObjectNN(args.data_root, background=args.background,
                            augmentation=args.augmentation, split="train",
                            pre_transform=pre)
    test_ds = ScanObjectNN(args.data_root, background=args.background,
                           augmentation=args.augmentation, split="test",
                           pre_transform=pre)
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
