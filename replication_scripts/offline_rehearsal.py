"""Offline rehearsal of the pretrained-evaluation replication path.

The real replication (paper Tables 1-4 via
``replication_scripts/pretrained/*.sh``, reference
replication_scripts/README.md:27-34) needs network access for the
datasets and the upstream release ``.pt`` weights. This rehearsal
exercises the EXACT same code path end-to-end with zero network:

  1. synthesize a tiny ModelNet10 raw fixture (OFF meshes) under a
     temp data root — the dataset processing pipeline
     (NormalizeScale -> SamplePoints -> GeodesicFPS) runs for real;
  2. synthesize a release-layout torch ``state_dict`` for the CLI's
     model (utils/torch_export.py, the tested inverse of the
     importer) and ``torch.save`` it as ``modelnet10.pt`` — byte-level
     the same artifact class as the upstream release files;
  3. invoke ``experiments/train_modelnet.py --checkpoint <pt>`` —
     the SAME command ``pretrained/modelnet40.sh`` runs — which
     auto-detects the ``.pt`` extension, routes through
     ``restore_any`` -> ``import_torch_checkpoint`` (strictness and
     skip reporting included) and evaluates.

When the environment gains network + the release weights, the real
replication is ``bash replication_scripts/fetch_and_verify.sh``; this
rehearsal is its permanent offline leg (and a test:
tests/experiments/test_offline_rehearsal.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

# The rehearsal is CPU-sized (32 points); force CPU regardless of the
# parent's platform (e.g. a TPU tunnel whose plugin env does not
# propagate to subprocesses). Override for a real-device rehearsal.
_PLATFORM = os.environ.get("DELTACONV_REHEARSAL_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if REPO not in sys.path:  # runnable from any cwd without installation
    sys.path.insert(0, REPO)

# Tiny-but-real rehearsal config (mirrors the CLI smoke tests).
NUM_POINTS = 32
K = 8
BATCH = 4


def make_modelnet_fixture(root: str, rng) -> None:
    """A 2-category ModelNet10-layout raw tree of random OFF meshes."""
    raw = os.path.join(root, "raw")
    for cat in ("chair", "table"):
        for split, count in (("train", 6), ("test", 4)):
            d = os.path.join(raw, cat, split)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                v = rng.random((30, 3))
                f = rng.integers(0, 30, (20, 3))
                with open(os.path.join(d, f"{cat}_{i:04d}.off"), "w") as fh:
                    fh.write("OFF\n30 20 0\n")
                    for row in v:
                        fh.write(" ".join(map(str, row)) + "\n")
                    for row in f:
                        fh.write("3 " + " ".join(map(str, row)) + "\n")
    # Marker the dataset uses to skip the (network) download step.
    open(os.path.join(raw, ".extracted"), "w").close()


def make_release_checkpoint(path: str) -> None:
    """A release-layout ``.pt`` for the CLI's exact model config."""
    import jax
    import jax.numpy as jnp
    import torch

    from deltaconv_tpu.models import DeltaNetClassification
    from deltaconv_tpu.utils.torch_export import export_torch_state_dict

    model = DeltaNetClassification(num_classes=10, num_neighbors=K,
                                   operator_dtype="float32")
    pos = jnp.zeros((2, NUM_POINTS, 3), jnp.float32)
    variables = jax.jit(
        lambda p: model.init(jax.random.PRNGKey(0), p, train=False)
    )(pos)
    sd = export_torch_state_dict(variables["params"],
                                 variables["batch_stats"],
                                 head="classification")
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in sd.items()}, path)


def make_shapenet_fixture(root: str, rng) -> None:
    """A 2-category ShapeNet-part-layout raw tree (xyz+normal+label
    text files + shuffled split lists), mirroring the real archive's
    structure (reference experiments/datasets/shapenet.py)."""
    import json

    raw = os.path.join(root, "raw")
    cat_ids = ["02691156", "02773838"]  # Airplane, Bag
    names = []
    for cid in cat_ids:
        os.makedirs(os.path.join(raw, cid), exist_ok=True)
        for i in range(4):
            n = 2 * NUM_POINTS
            nrm = rng.standard_normal((n, 3))
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            arr = np.concatenate(
                [rng.random((n, 3)), nrm,
                 rng.integers(0, 4, (n, 1)).astype(float)], axis=1)
            np.savetxt(os.path.join(raw, cid, f"model{i}.txt"), arr)
            names.append(f"shape_data/{cid}/model{i}")
    split_dir = os.path.join(raw, "train_test_split")
    os.makedirs(split_dir, exist_ok=True)
    for split, sel in (("train", names[:4]), ("val", names[4:5]),
                       ("test", names[5:])):
        with open(os.path.join(split_dir,
                               f"shuffled_{split}_file_list.json"),
                  "w") as f:
            json.dump(sel, f)
    open(os.path.join(raw, ".extracted"), "w").close()


def make_seg_release_checkpoint(path: str) -> None:
    """A release-layout ``.pt`` for test_shapenet.py's EXACT model
    (the shared ``shapenet_model`` builder with its pinned RECIPE)."""
    import jax
    import jax.numpy as jnp
    import torch

    from deltaconv_tpu.utils.torch_export import export_torch_state_dict

    exp = os.path.join(REPO, "experiments")
    if exp not in sys.path:
        sys.path.insert(0, exp)
    from train_shapenet import shapenet_model  # noqa: E402

    class _Args:
        k = K
        grad_regularizer = 0.001
        grad_kernel = 1.0
        operator_dtype = "float32"
        knn_method = "exact"

    model = shapenet_model(_Args(), 50)
    pos = jnp.zeros((2, NUM_POINTS, 3), jnp.float32)
    cat = jnp.zeros((2, 16), jnp.float32).at[:, 0].set(1.0)
    variables = jax.jit(
        lambda p, c: model.init(jax.random.PRNGKey(0), p, category=c,
                                train=False)
    )(pos, cat)
    sd = export_torch_state_dict(variables["params"],
                                 variables["batch_stats"],
                                 head="segmentation")
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in sd.items()}, path)


def main() -> int:
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        data_root = os.path.join(tmp, "ModelNet10")
        make_modelnet_fixture(data_root, rng)
        ckpt = os.path.join(tmp, "modelnet10.pt")
        make_release_checkpoint(ckpt)

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = _PLATFORM
        # APPEND (not overwrite): environments may supply deps or
        # device plugins via PYTHONPATH (ADVICE r4).
        env["PYTHONPATH"] = os.pathsep.join(
            [REPO] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH")
                      else []))
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        # The SAME invocation as pretrained/modelnet40.sh, on the
        # fixture root + synthesized release checkpoint.
        cmd = [
            sys.executable,
            os.path.join(REPO, "experiments", "train_modelnet.py"),
            "--checkpoint", ckpt,
            "--num_classes", "10",
            "--num_points", str(NUM_POINTS),
            "--sampling_margin", "2",
            "--k", str(K),
            "--batch_size", str(BATCH),
            "--data_root", data_root,
            "--logdir", os.path.join(tmp, "logs"),
            "--operator_dtype", "float32",
            "--no_data_parallel",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              env=env, timeout=900)
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            print("offline rehearsal: FAILED")
            return proc.returncode
        if "Test accuracy" not in proc.stdout:
            print("offline rehearsal: eval produced no accuracy line")
            return 1
        if "skipped keys" in proc.stdout:
            print("offline rehearsal: torch import skipped keys")
            return 1
        print("offline rehearsal: OK — .pt import + eval path exercised")

        # ---- Segmentation / voting leg (round-5 directive): the SAME
        # command ``pretrained/shapenet.sh`` runs — test_shapenet.py's
        # 10-vote summed-logit evaluation (reference
        # test_shapenet.py:79-96) — on a synthesized ShapeNet fixture
        # + a release-layout seg checkpoint.
        seg_root = os.path.join(tmp, "ShapeNet")
        make_shapenet_fixture(seg_root, rng)
        seg_ckpt = os.path.join(tmp, "shapenet.pt")
        make_seg_release_checkpoint(seg_ckpt)
        seg_cmd = [
            sys.executable,
            os.path.join(REPO, "experiments", "test_shapenet.py"),
            "--checkpoint", seg_ckpt,
            "--num_votes", "2",
            "--num_points", str(NUM_POINTS),
            "--k", str(K),
            "--batch_size", str(BATCH),
            "--data_root", seg_root,
            "--logdir", os.path.join(tmp, "seg_logs"),
            "--operator_dtype", "float32",
            "--no_data_parallel",
        ]
        proc = subprocess.run(seg_cmd, capture_output=True, text=True,
                              env=env, timeout=2100)
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            print("offline rehearsal (seg voting): FAILED")
            return proc.returncode
        if "Instance mIoU" not in proc.stdout:
            print("offline rehearsal (seg voting): no mIoU line")
            return 1
        if "skipped keys" in proc.stdout:
            print("offline rehearsal (seg voting): import skipped keys")
            return 1
        print("offline rehearsal: OK — seg .pt import + voting eval "
              "path exercised")
        return 0


if __name__ == "__main__":
    sys.exit(main())
