"""Dataset processing tests over synthesized raw files (no network)."""

import json
import os
import zipfile

import numpy as np
import pytest

from deltaconv_tpu.data import (
    BatchLoader,
    ModelNet,
    SHREC,
    ScanObjectNN,
    ShapeNet,
)
from deltaconv_tpu.data.io import read_obj, read_off, read_ply
from deltaconv_tpu.data.shapeseg import edge_to_vertex_labels
from deltaconv_tpu.transforms import Compose, NormalizeScale, SamplePoints


def _write_off(path, rng, nv=20, nf=10):
    v = rng.random((nv, 3))
    f = rng.integers(0, nv, (nf, 3))
    with open(path, "w") as fh:
        fh.write("OFF\n")
        fh.write(f"{nv} {nf} 0\n")
        for row in v:
            fh.write(" ".join(f"{x:.6f}" for x in row) + "\n")
        for row in f:
            fh.write("3 " + " ".join(str(i) for i in row) + "\n")


def test_read_off_headerless(tmp_path, rng):
    # ModelNet's raw quirk: counts on the OFF line itself.
    p = tmp_path / "m.off"
    with open(p, "w") as fh:
        fh.write("OFF3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    c = read_off(str(p))
    assert c.pos.shape == (3, 3)
    assert c.face.shape == (3, 1)


def test_modelnet_processing(tmp_path, rng):
    root = tmp_path / "modelnet"
    raw = root / "raw"
    for cat in ("chair", "table"):
        for split in ("train", "test"):
            d = raw / cat / split
            os.makedirs(d)
            for i in range(3):
                _write_off(d / f"{cat}_{i:04d}.off", rng)
    open(raw / ".extracted", "w").close()

    pre = Compose([
        NormalizeScale(),
        SamplePoints(64, include_normals=True, seed=0),
    ])
    ds = ModelNet(str(root), name="10", split="train", pre_transform=pre)
    assert len(ds) == 6
    c = ds[0]
    assert c.pos.shape == (64, 3)
    assert c.normal.shape == (64, 3)
    assert int(c.y) in (0, 1)

    # Cache reload without raw access.
    ds2 = ModelNet(str(root), name="10", split="test", pre_transform=pre)
    assert len(ds2) == 6

    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["pos"].shape == (2, 64, 3)
    assert batches[0]["normal"].shape == (2, 64, 3)
    assert batches[0]["label"].shape == (2,)


def test_shapenet_processing(tmp_path, rng):
    root = tmp_path / "shapenet"
    raw = root / "raw"
    cat_ids = ["02691156", "02773838"]  # Airplane, Bag
    names = []
    for cid in cat_ids:
        os.makedirs(raw / cid)
        for i in range(2):
            n = 50
            arr = np.concatenate(
                [rng.random((n, 6)),
                 rng.integers(0, 4, (n, 1)).astype(float)], axis=1
            )
            fn = f"{cid}/model{i}.txt"
            np.savetxt(raw / fn, arr)
            names.append(f"shape_data/{cid}/model{i}")
    split_dir = raw / "train_test_split"
    os.makedirs(split_dir)
    for split, sel in (("train", names[:2]), ("val", names[2:3]),
                       ("test", names[3:])):
        with open(split_dir / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump(sel, f)
    open(raw / ".extracted", "w").close()

    ds = ShapeNet(str(root), categories=["Airplane", "Bag"],
                  split="trainval")
    assert len(ds) == 3
    c = ds[0]
    assert c.pos.shape == (50, 3)
    assert c.normal.shape == (50, 3)
    assert c.y.shape == (50,)
    assert c.category.shape == (16,)

    batch = BatchLoader(ds, batch_size=3).collate([ds[i] for i in range(3)])
    assert batch["category"].shape == (3, 16)
    assert batch["label"].shape == (3, 50)


def test_shrec_processing(tmp_path, rng):
    root = tmp_path / "shrec"
    raw = root / "raw"
    os.makedirs(raw)

    # Build a zip with 2 classes x (train 12, test 2) tiny obj meshes.
    zpath = raw / "shrec_16.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for cls in ("alien", "ants"):
            for split, count in (("train", 12), ("test", 2)):
                for i in range(count):
                    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
                    z.writestr(f"shrec_16/{cls}/{split}/T{i}.obj", obj)

    ds = SHREC(str(root), split="train", split10=True, split_seed=0)
    assert len(ds) == 20  # 10 per class x 2 classes
    ds_t = SHREC(str(root), split="test", split10=True, split_seed=0)
    assert len(ds_t) == 4


def test_scanobjectnn_processing(tmp_path, rng):
    import h5py

    root = tmp_path / "sonn"
    raw = root / "raw" / "main_split_nobg"
    os.makedirs(raw)
    for fn, count in (("training_objectdataset.h5", 6),
                      ("test_objectdataset.h5", 3)):
        with h5py.File(raw / fn, "w") as f:
            f["data"] = rng.random((count, 32, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 15, count)

    ds = ScanObjectNN(str(root), background=False, augmentation=None,
                      split="train")
    assert len(ds) == 6
    assert ds[0].pos.shape == (32, 3)

    with pytest.raises(RuntimeError, match="manual download"):
        ScanObjectNN(str(tmp_path / "missing"), split="train")


def test_edge_to_vertex_labels():
    # Two triangles sharing an edge: 0-1-2, 1-3-2.
    face = np.array([[0, 1], [1, 3], [2, 2]], np.int64)
    # MeshCNN edge order: (0,1),(1,2),(0,2) then (1,3),(2,3) [(1,2) dup].
    edge_labels = np.array([1, 2, 1, 3, 2], np.int64)
    y = edge_to_vertex_labels(face, edge_labels, 4)
    assert y.shape == (4,)
    assert y.min() >= 0


def test_ply_roundtrip(tmp_path):
    # ascii PLY triangle.
    p = tmp_path / "t.ply"
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
    c = read_ply(str(p))
    assert c.pos.shape == (3, 3)
    assert c.face.shape == (3, 1)


def test_batchloader_host_sharding():
    """Per-host loaders with a shared seed partition every global
    batch disjointly and identically to the single-host order."""
    import numpy as np

    from deltaconv_tpu.data import BatchLoader, Cloud

    class _List:
        def __init__(self, c):
            self.c = c

        def __len__(self):
            return len(self.c)

        def __getitem__(self, i):
            return self.c[i]

    rng = np.random.default_rng(0)
    ds = _List([Cloud(pos=rng.random((8, 3)).astype(np.float32),
                      y=np.int64(i)) for i in range(20)])

    global_loader = BatchLoader(ds, 8, shuffle=True, seed=7)
    shards = [BatchLoader(ds, 4, shuffle=True, seed=7,
                          process_index=p, process_count=2)
              for p in range(2)]
    assert len(global_loader) == len(shards[0]) == len(shards[1]) == 2

    for gb, b0, b1 in zip(global_loader, *shards):
        merged = np.concatenate([b0["label"], b1["label"]])
        np.testing.assert_array_equal(merged, gb["label"])
        assert len(set(merged.tolist())) == 8  # disjoint within batch
