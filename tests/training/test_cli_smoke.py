"""End-to-end smokes for the remaining training CLIs.

`test_loop.py` drives train_modelnet.py and the ShapeNet train+voting
pair; these cover the other three reference scripts
(/root/reference/experiments/train_{shrec,scanobjectnn,shapeseg}.py)
on synthesized fixtures — raw-file fixtures where processing is cheap
(SHREC OBJ zip, ScanObjectNN h5), a synthesized processed cache where
the raw archive's layout is hardwired to the upstream blob (ShapeSeg's
composite Adobe+FAUST+MIT+SCAPE zip).
"""

import os
import subprocess
import sys
import zipfile

import numpy as np
import pytest


def _repo_root():
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )


def _run_cli(script, argv, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _repo_root()
    # Subprocesses don't import conftest.py — point them at the same
    # persistent compile cache so repeated runs skip XLA compiles.
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    path = os.path.join(_repo_root(), "experiments", script)
    result = subprocess.run(
        [sys.executable, path] + argv,
        capture_output=True, text=True, env=env, timeout=timeout,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return result.stdout


_FAST = ["--epochs", "1", "--num_points", "32", "--k", "8",
         "--batch_size", "4", "--sampling_margin", "2",
         "--operator_dtype", "float32", "--no_data_parallel"]


@pytest.mark.slow
def test_train_shrec_cli(tmp_path):
    """SHREC CLI end-to-end on a synthesized OBJ zip (2 classes,
    split10 takes 10 train meshes per class)."""
    raw = tmp_path / "shrec" / "raw"
    os.makedirs(raw)
    with zipfile.ZipFile(raw / "shrec_16.zip", "w") as z:
        for cls in ("alien", "ants"):
            for split, count in (("train", 12), ("test", 2)):
                for i in range(count):
                    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                           "f 1 2 3\nf 1 2 4\nf 2 3 4\n")
                    z.writestr(f"shrec_16/{cls}/{split}/T{i}.obj", obj)

    out = _run_cli("train_shrec.py", _FAST + [
        "--split_seed", "0", "--data_root", str(tmp_path / "shrec"),
        "--logdir", str(tmp_path / "logs"),
    ])
    assert "Test accuracy" in out


@pytest.mark.slow
def test_train_scanobjectnn_cli(tmp_path):
    """ScanObjectNN CLI end-to-end on a synthesized h5 fixture."""
    h5py = pytest.importorskip("h5py")
    raw = tmp_path / "sonn" / "raw" / "main_split_nobg"
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    for fn, count in (("training_objectdataset.h5", 8),
                      ("test_objectdataset.h5", 4)):
        with h5py.File(raw / fn, "w") as f:
            f["data"] = rng.random((count, 64, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 15, count)

    out = _run_cli("train_scanobjectnn.py", _FAST + [
        "--data_root", str(tmp_path / "sonn"),
        "--logdir", str(tmp_path / "logs"),
    ])
    assert "Test accuracy" in out


@pytest.mark.slow
def test_train_shapeseg_cli(tmp_path):
    """ShapeSeg CLI end-to-end on a synthesized PROCESSED cache (the
    raw composite zip's member counts are hardwired upstream —
    data/shapeseg.py — so the fixture enters after the process step,
    exactly what a cached dataset directory looks like)."""
    from deltaconv_tpu.data.cloud import Cloud
    from deltaconv_tpu.data.dataset import CloudDataset

    rng = np.random.default_rng(0)

    def clouds(count):
        out = []
        for _ in range(count):
            pos = rng.random((32, 3)).astype(np.float32)
            nrm = rng.standard_normal((32, 3)).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            y = rng.integers(0, 8, 32).astype(np.int64)
            out.append(Cloud(pos=pos, normal=nrm, y=y))
        return out

    proc = tmp_path / "shapeseg" / "processed"
    CloudDataset._save(str(proc / "shapeseg_train.npz"), clouds(10))
    CloudDataset._save(str(proc / "shapeseg_test.npz"), clouds(4))

    out = _run_cli("train_shapeseg.py", _FAST + [
        "--data_root", str(tmp_path / "shapeseg"),
        "--logdir", str(tmp_path / "logs"),
    ])
    assert "Test accuracy" in out
