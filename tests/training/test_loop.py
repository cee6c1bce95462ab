"""Training-loop and CLI smoke tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltaconv_tpu.data import BatchLoader, Cloud
from deltaconv_tpu.data.synthetic import synthetic_shapes
from deltaconv_tpu.models import DeltaNetClassification
from deltaconv_tpu.training import (
    FitConfig,
    MetricsLogger,
    cosine_epoch_schedule,
    create_train_state,
    evaluate_voting,
    fit,
    latest_step,
    sgd_momentum,
)


class _ListDataset:
    def __init__(self, clouds):
        self.clouds = clouds

    def __len__(self):
        return len(self.clouds)

    def __getitem__(self, i):
        return self.clouds[i]


def _dataset(seed, count=16, n=64, classes=3):
    rng = np.random.default_rng(seed)
    pos, normal, labels = synthetic_shapes(rng, count, n, classes)
    return _ListDataset([
        Cloud(pos=pos[i], normal=normal[i], y=np.int64(labels[i]))
        for i in range(count)
    ])


def test_fit_end_to_end(tmp_path):
    train_loader = BatchLoader(_dataset(0), 8, shuffle=True, seed=0)
    test_loader = BatchLoader(_dataset(1), 8, drop_last=False)

    model = DeltaNetClassification(num_classes=3, conv_channels=(8, 8),
                                   num_neighbors=8)
    example = next(iter(train_loader))
    schedule = cosine_epoch_schedule(0.05, 3, len(train_loader),
                                     eta_min=0.001)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jnp.asarray(example["pos"]),),
        sgd_momentum(schedule),
        init_kwargs={"normal": jnp.asarray(example["normal"])},
    )

    run_dir = str(tmp_path / "run")
    ckpt_dir = str(tmp_path / "ckpt")
    logger = MetricsLogger(run_dir)
    config = FitConfig(epochs=3, seed=0, checkpoint_every=2, log_every=2)

    def augment(key, batch):
        from deltaconv_tpu.transforms import augment_classification

        pos, normal = augment_classification(key, batch["pos"],
                                             batch["normal"])
        return {**batch, "pos": pos, "normal": normal}

    state = fit(model, state, train_loader, test_loader, config,
                logger=logger, checkpoint_dir=ckpt_dir, augment=augment)
    logger.close()

    assert latest_step(ckpt_dir) == 3
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    import json

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        tags = {json.loads(line)["tag"] for line in f}
    assert "test accuracy" in tags
    assert "training loss" in tags


def test_evaluate_voting_classification():
    # Voting over a segmentation-style loader with categories.
    rng = np.random.default_rng(3)
    count, n = 8, 32
    pos, normal, _ = synthetic_shapes(rng, count, n, 2)
    y = rng.integers(4, 6, (count, n))  # parts of category 1 ('bag')
    cat = np.zeros((count, 16), np.float32)
    cat[:, 1] = 1.0
    ds = _ListDataset([
        Cloud(pos=pos[i], normal=normal[i], y=y[i], category=cat[i])
        for i in range(count)
    ])
    loader = BatchLoader(ds, 4, drop_last=False)

    from deltaconv_tpu.models import DeltaNetSegmentation

    model = DeltaNetSegmentation(num_classes=50, conv_channels=(8,),
                                 mlp_depth=1, embedding_size=16,
                                 categorical_vector=True, num_neighbors=8)
    example = next(iter(loader))
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jnp.asarray(example["pos"]),),
        sgd_momentum(0.01),
        init_kwargs={
            "normal": jnp.asarray(example["normal"]),
            "category": jnp.asarray(example["category"]),
        },
    )
    mean_iou, per_class = evaluate_voting(model, state, loader, None,
                                          num_votes=2)
    assert 0.0 <= mean_iou <= 1.0
    assert set(per_class.keys()) == {1}


@pytest.mark.slow
def test_train_modelnet_cli(tmp_path, rng):
    """Drive the ModelNet CLI end-to-end on synthesized raw meshes."""
    root = tmp_path / "ModelNet10"
    raw = root / "raw"
    for cat in ("chair", "table"):
        for split in ("train", "test"):
            d = raw / cat / split
            os.makedirs(d)
            for i in range(6):
                v = rng.random((30, 3))
                f = rng.integers(0, 30, (20, 3))
                with open(d / f"{cat}_{i:04d}.off", "w") as fh:
                    fh.write("OFF\n30 20 0\n")
                    for row in v:
                        fh.write(" ".join(map(str, row)) + "\n")
                    for row in f:
                        fh.write("3 " + " ".join(map(str, row)) + "\n")
    open(raw / ".extracted", "w").close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )
    script = os.path.join(env["PYTHONPATH"], "experiments",
                          "train_modelnet.py")
    result = subprocess.run(
        [sys.executable, script, "--num_classes", "10", "--epochs", "1",
         "--num_points", "32", "--sampling_margin", "2", "--batch_size",
         "4", "--k", "8", "--data_root", str(root), "--logdir",
         str(tmp_path / "logs"), "--operator_dtype", "float32",
         "--no_data_parallel"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Test accuracy" in result.stdout


def test_shapenet_cli_train_and_voting_eval(tmp_path, rng):
    """Drive the segmentation CLIs end-to-end on a synthetic ShapeNet
    fixture: train_shapenet.py for one epoch (checkpoint written),
    then test_shapenet.py voting evaluation from that checkpoint."""
    import json as _json

    root = tmp_path / "shapenet"
    raw = root / "raw"
    cat_ids = ["02691156", "02773838"]  # Airplane, Bag
    names = []
    for cid in cat_ids:
        os.makedirs(raw / cid)
        for i in range(6):
            n = 40
            arr = np.concatenate(
                [rng.random((n, 6)),
                 rng.integers(0, 4, (n, 1)).astype(float)], axis=1)
            fn = f"{cid}/model{i}.txt"
            np.savetxt(raw / fn, arr)
            names.append(f"shape_data/{cid}/model{i}")
    split_dir = raw / "train_test_split"
    os.makedirs(split_dir)
    for split, sel in (("train", names[:8]), ("val", names[8:10]),
                       ("test", names[10:])):
        with open(split_dir / f"shuffled_{split}_file_list.json",
                  "w") as f:
            _json.dump(sel, f)
    open(raw / ".extracted", "w").close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".."))
    exp = os.path.join(env["PYTHONPATH"], "experiments")
    common = [
        "--num_points", "32", "--batch_size", "4", "--k", "8",
        "--data_root", str(root), "--logdir", str(tmp_path / "logs"),
        "--operator_dtype", "float32", "--no_data_parallel",
    ]
    result = subprocess.run(
        [sys.executable, os.path.join(exp, "train_shapenet.py"),
         "--epochs", "1"] + common,
        capture_output=True, text=True, env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "mIoU" in result.stdout or "accuracy" in result.stdout

    ckpts = list((tmp_path / "logs").rglob("step_*"))
    assert ckpts, "train_shapenet wrote no checkpoint"
    result = subprocess.run(
        [sys.executable, os.path.join(exp, "test_shapenet.py"),
         "--checkpoint", str(sorted(ckpts)[-1].parent),
         "--num_votes", "2"]
        + common,
        capture_output=True, text=True, env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "mIoU" in result.stdout


def test_fit_resume_matches_uninterrupted(tmp_path):
    """An interrupted run resumed from its checkpoint follows the exact
    trajectory of an uninterrupted one: per-epoch RNG folds on
    (seed, epoch) and BatchLoader.set_epoch derives the shuffle order
    the same way, so the final parameters agree bitwise."""
    model = DeltaNetClassification(num_classes=3, conv_channels=(8, 8),
                                   num_neighbors=8)

    def fresh():
        loader = BatchLoader(_dataset(0), 8, shuffle=True, seed=0)
        example = next(iter(loader))
        state = create_train_state(
            model, jax.random.PRNGKey(0), (jnp.asarray(example["pos"]),),
            sgd_momentum(0.05),
            init_kwargs={"normal": jnp.asarray(example["normal"])},
        )
        return loader, state

    test_loader = BatchLoader(_dataset(1), 8, drop_last=False)

    # Uninterrupted: 4 epochs straight through.
    loader, state = fresh()
    full = fit(model, state, loader, test_loader,
               FitConfig(epochs=4, seed=0, checkpoint_every=10),
               checkpoint_dir=str(tmp_path / "full"))

    # Interrupted: 2 epochs (checkpointed), then resume to 4.
    loader, state = fresh()
    fit(model, state, loader, test_loader,
        FitConfig(epochs=2, seed=0, checkpoint_every=2),
        checkpoint_dir=str(tmp_path / "part"))
    loader, state = fresh()  # cold process: state restored inside fit
    resumed = fit(model, state, loader, test_loader,
                  FitConfig(epochs=4, seed=0, checkpoint_every=2),
                  checkpoint_dir=str(tmp_path / "part"), resume=True)

    assert int(resumed.step) == int(full.step)
    flat_f = jax.tree_util.tree_leaves(full.params)
    flat_r = jax.tree_util.tree_leaves(resumed.params)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume=True with no checkpoint yet is a no-op start.
    loader, state = fresh()
    out = fit(model, state, loader, test_loader,
              FitConfig(epochs=1, seed=0, checkpoint_every=5),
              checkpoint_dir=str(tmp_path / "empty"), resume=True)
    assert int(out.step) == len(loader)
