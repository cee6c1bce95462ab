"""End-to-end parity against the EXECUTED reference implementation.

Unlike ``test_torch_reference.py`` (which re-types the reference's
math as a dense-torch oracle), these tests import and RUN the actual
upstream package from /root/reference — through the dependency shims
in ``tools/pyg_shims.py`` — then import its randomly initialized
``state_dict`` through ``utils/torch_import.py`` and demand matching
logits from this framework on the same clouds. This pins the full
pipeline at once: kNN convention, operator build, conv stack, pooling,
heads, and the checkpoint importer's key mapping.

Reference entry points under test:
  models/deltanet_classification.py:39-50 (forward),
  models/deltanet_segmentation.py:55-70 (forward),
  models/deltanet_base.py:42-87 (kNN + operator build + conv loop).
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

from tools.pyg_shims import Data, load_reference  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from deltaconv_tpu.utils.torch_import import import_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def reference():
    return load_reference()


def _cloud(seed, b, n):
    torch.manual_seed(seed)
    pos = torch.randn(b * n, 3)
    normal = torch.nn.functional.normalize(torch.randn(b * n, 3), dim=-1)
    batch = torch.arange(b).repeat_interleave(n)
    return pos, normal, batch


def _imported(rmodel):
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in rmodel.state_dict().items()}
    params, bstats, skipped = import_state_dict(sd)
    # The ONLY tolerated skips: VectorNonLin's unused bias (it is
    # dead when batch-normalized; torch_import.py docstring) and BN
    # step counters. Anything else is a silently missing weight.
    leftovers = [s for s in skipped
                 if "num_batches_tracked" not in s
                 and not (".v_mlp." in s and s.endswith(".bias"))]
    assert leftovers == [], leftovers
    return {"params": params, "batch_stats": bstats}


@pytest.mark.slow
def test_classification_logits_match_executed_reference(reference):
    b, n = 2, 128
    pos, normal, batch = _cloud(0, b, n)
    rmodel = reference.models.DeltaNetClassification(
        in_channels=3, num_classes=40)
    rmodel.eval()
    with torch.no_grad():
        want = rmodel(Data(pos=pos, batch=batch, norm=normal)).numpy()

    from deltaconv_tpu.models import DeltaNetClassification

    model = DeltaNetClassification(num_classes=40, dense_operators=True,
                                   knn_method="exact")
    got = np.asarray(model.apply(
        _imported(rmodel),
        jnp.asarray(pos.numpy().reshape(b, n, 3)),
        normal=jnp.asarray(normal.numpy().reshape(b, n, 3)),
        train=False))

    # Measured deviation ~3e-4 at logit scale ~0.09 (different WLS
    # solvers: reference linalg.inv vs our Cholesky, both f32);
    # tolerance gives ~10x headroom without hiding a real defect.
    assert want.shape == got.shape == (b, 40)
    np.testing.assert_allclose(got, want, atol=3e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


@pytest.mark.slow
def test_classification_logits_match_without_normals(reference):
    """No-normals path: the reference estimates frames from a 10-NN
    SVD (deltanet_base.py:64-66); ours from the closed-form 3x3 eigh.
    On surface-like clouds the WLS is well-conditioned and the two
    pipelines agree to ~1e-7 (the with-normals test's 3e-4 budget is
    conditioning amplification from its deliberately random normals)."""
    from deltaconv_tpu.data import synthetic_classification_batch

    b, n = 2, 128
    d = synthetic_classification_batch(3, b, n, 4)
    pos = torch.from_numpy(np.asarray(d["pos"]).reshape(b * n, 3))
    batch = torch.arange(b).repeat_interleave(n)
    torch.manual_seed(0)
    rmodel = reference.models.DeltaNetClassification(
        in_channels=3, num_classes=40)
    rmodel.eval()
    with torch.no_grad():
        want = rmodel(Data(pos=pos, batch=batch, norm=None)).numpy()

    from deltaconv_tpu.models import DeltaNetClassification

    model = DeltaNetClassification(num_classes=40, dense_operators=True,
                                   knn_method="exact")
    got = np.asarray(model.apply(_imported(rmodel), jnp.asarray(d["pos"]),
                                 train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_segmentation_logits_match_executed_reference(reference):
    b, n, classes = 2, 128, 8
    pos, normal, batch = _cloud(1, b, n)
    category = torch.eye(16)[torch.tensor([3, 11])]
    rmodel = reference.models.DeltaNetSegmentation(
        in_channels=3, num_classes=classes, conv_channels=[16, 32],
        mlp_depth=2, embedding_size=64, categorical_vector=True)
    rmodel.eval()
    with torch.no_grad():
        want = rmodel(Data(pos=pos, batch=batch, norm=normal,
                           category=category)).numpy()

    from deltaconv_tpu.models import DeltaNetSegmentation

    model = DeltaNetSegmentation(
        num_classes=classes, conv_channels=(16, 32), mlp_depth=2,
        embedding_size=64, categorical_vector=True,
        dense_operators=True, knn_method="exact")
    got = np.asarray(model.apply(
        _imported(rmodel),
        jnp.asarray(pos.numpy().reshape(b, n, 3)),
        normal=jnp.asarray(normal.numpy().reshape(b, n, 3)),
        category=jnp.asarray(category.numpy()),
        train=False))

    assert got.shape == (b, n, classes)
    np.testing.assert_allclose(got.reshape(b * n, classes), want,
                               atol=3e-3)
    agree = (got.reshape(b * n, classes).argmax(-1)
             == want.argmax(-1)).mean()
    assert agree > 0.99, agree
