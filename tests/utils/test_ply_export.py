"""PLY export roundtrip tests (read back with our own PLY reader)."""

import numpy as np

from deltaconv_tpu.data.io import read_ply
from deltaconv_tpu.utils import save_feature, save_ply


def test_save_ply_roundtrip(tmp_path, rng):
    n = 20
    pos = rng.random((n, 3)).astype(np.float32)
    normal = rng.random((n, 3)).astype(np.float32)
    y = rng.integers(0, 5, n)

    path = str(tmp_path / "cloud.ply")
    save_ply(path, pos, normal=normal, y=y, scalar=pos[:, 0])
    back = read_ply(path)
    np.testing.assert_allclose(back.pos, pos, atol=1e-5)

    # Binary variant parses too.
    path_b = str(tmp_path / "cloud_bin.ply")
    save_ply(path_b, pos, normal=normal, binary=True)
    back = read_ply(path_b)
    np.testing.assert_allclose(back.pos, pos, atol=1e-5)


def test_save_feature_files(tmp_path, rng):
    n, c = 16, 3
    pos = rng.random((n, 3)).astype(np.float32)
    frames = rng.random((3, n, 3)).astype(np.float32)
    xs = rng.random((n, c)).astype(np.float32)
    vs = rng.random((n, 2, c)).astype(np.float32)

    root = str(tmp_path / "feat")
    save_feature(root, pos, frames[0], frames[1], frames[2], xs, vs=vs, i=0)
    for j in range(c):
        back = read_ply(f"{root}_shape0_feat{j}.ply")
        np.testing.assert_allclose(back.pos, pos, atol=1e-5)
