"""Human-body segmentation (ShapeSeg) with DeltaConv on TPU.

Reference recipe (/root/reference/experiments/train_shapeseg.py):
8 classes, conv channels [128]x8, mlp depth 1, embedding 512,
Adam + StepLR(30, 0.1), 1024 points, NormalizeArea + NormalizeAxes +
SamplePoints(labels) + GeodesicFPS preprocessing, 90/10 seeded
train/val split with early stopping on best validation accuracy;
train-time RandomScale(0.8, 1.2) + RandomRotate(360, z) +
RandomTranslateGlobal(0.1).
"""

import numpy as np

import jax
import jax.numpy as jnp

from common import base_parser, finish_args, make_logger


def augment(key, batch):
    from deltaconv_tpu.transforms import (
        random_rotate, random_scale, random_translate_global,
    )

    k0, k1, k2 = jax.random.split(key, 3)
    pos, normal = batch["pos"], batch.get("normal")
    pos, normal = random_scale(k0, pos, normal, (0.8, 1.2))
    pos, normal = random_rotate(k1, pos, normal, 360, axis=2)
    pos = random_translate_global(k2, pos, 0.1)
    out = dict(batch)
    out["pos"] = pos
    if normal is not None:
        out["normal"] = normal
    return out


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


# Reference recipe constants (train_shapeseg.py:68-83,118 — NO label
# smoothing: calc_loss(..., smoothing=False)).
RECIPE = {
    "num_classes": 8,
    "conv_channels": (128,) * 8,
    "mlp_depth": 1,
    "embedding_size": 512,
    "optimizer": "adam",
    "schedule": "step_lr",
    "step_size": 30,
    "gamma": 0.1,
    "smoothing": 0.0,
    "aug_scales": (0.8, 1.2),
    "aug_translate": 0.1,
}


def build_parser():
    """CLI defaults per reference train_shapeseg.py:145-178."""
    parser = base_parser("DeltaNet ShapeSeg human segmentation (TPU)")
    parser.set_defaults(num_points=1024, epochs=50, lr=0.005, batch_size=8)
    return parser


def main():
    args = build_parser().parse_args()
    args = finish_args(args, "shapeseg", "ShapeSeg")

    from deltaconv_tpu.data import BatchLoader, ShapeSeg
    from deltaconv_tpu.models import DeltaNetSegmentation
    from deltaconv_tpu.training import (
        FitConfig, adam_steplr, create_train_state, evaluate_segmentation,
        fit, restore_any, save_checkpoint,
    )
    from deltaconv_tpu.transforms import (
        Compose, GeodesicFPS, NormalizeArea, NormalizeAxes, SamplePoints,
    )

    pre = Compose([
        NormalizeArea(),
        NormalizeAxes(),
        SamplePoints(args.num_points * args.sampling_margin,
                     include_normals=True, include_labels=True,
                     seed=args.seed),
        GeodesicFPS(args.num_points, seed=args.seed),
    ])
    full_train = ShapeSeg(args.data_root, split="train", pre_transform=pre)
    test_ds = ShapeSeg(args.data_root, split="test", pre_transform=pre)

    # Seeded 90/10 train/validation split (reference :47-50).
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(full_train))
    n_train = int(len(full_train) * 0.9)
    train_ds = _Subset(full_train, order[:n_train])
    val_ds = _Subset(full_train, order[n_train:])

    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                               seed=args.seed)
    val_loader = BatchLoader(val_ds, args.batch_size, shuffle=False,
                             drop_last=False)
    test_loader = BatchLoader(test_ds, args.batch_size, shuffle=False,
                              drop_last=False)

    model = DeltaNetSegmentation(
        num_classes=RECIPE["num_classes"],
        conv_channels=RECIPE["conv_channels"],
        mlp_depth=RECIPE["mlp_depth"],
        embedding_size=RECIPE["embedding_size"],
        num_neighbors=args.k,
        grad_regularizer=args.grad_regularizer,
        grad_kernel_width=args.grad_kernel,
        operator_dtype=args.operator_dtype,
        knn_method=args.knn_method,
    )
    example = next(iter(train_loader))
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), (jnp.asarray(example["pos"]),),
        adam_steplr(args.lr, step_size=RECIPE["step_size"],
                    gamma=RECIPE["gamma"],
                    steps_per_epoch=len(train_loader)),
        init_kwargs={"normal": jnp.asarray(example["normal"])},
    )

    logger, ckpt_dir = make_logger(args)
    if args.evaluating:
        state = restore_any(args.checkpoint, state)
        scalars = evaluate_segmentation(model, state, test_loader,
                                        with_iou=False)
        print("Test accuracy: {test accuracy}".format(**scalars))
        return

    # Early stopping on best validation accuracy (reference :98-101).
    best = {"val": 0.0, "test": 0.0}

    def eval_fn(s):
        val = evaluate_segmentation(model, s, val_loader, with_iou=False)
        test = evaluate_segmentation(model, s, test_loader, with_iou=False)
        scalars = {
            "validation accuracy": val["test accuracy"],
            "test accuracy": test["test accuracy"],
        }
        if val["test accuracy"] > best["val"]:
            best["val"] = val["test accuracy"]
            best["test"] = test["test accuracy"]
            if ckpt_dir:
                save_checkpoint(ckpt_dir, s, step=0)  # best.pt analog
        return scalars

    # Reference trains WITHOUT label smoothing
    # (train_shapeseg.py:118: calc_loss(..., smoothing=False)).
    config = FitConfig(epochs=args.epochs, seed=args.seed,
                       smoothing=RECIPE["smoothing"],
                       data_parallel=not args.no_data_parallel)
    fit(model, state, train_loader, test_loader, config, logger=logger,
        checkpoint_dir=None, augment=augment, per_point=True,
        eval_fn=eval_fn)
    print("Test accuracy: {}".format(best["test"]))


if __name__ == "__main__":
    main()
