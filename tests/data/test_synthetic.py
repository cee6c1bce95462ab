"""Synthetic generators: the seg labels must be balanced rank
quantiles (deltaconv_tpu/data/synthetic.py)."""


def test_synthetic_seg_shapes_balanced_parts():
    """Height-band labels are rank quantiles: every part has exactly
    N / num_parts points, and bands are ordered by z."""
    import numpy as np
    from deltaconv_tpu.data.synthetic import (
        synthetic_seg_shapes,
        synthetic_segmentation_batch,
    )

    rng = np.random.default_rng(0)
    pos, normal, label, cats = synthetic_seg_shapes(rng, 4, 128, 4)
    assert pos.shape == (4, 128, 3) and label.shape == (4, 128)
    for b in range(4):
        counts = np.bincount(label[b], minlength=4)
        assert (counts == 32).all()
        # Ordered bands: every point in part p sits below every point
        # in part p+1 (labels are z-rank quantiles).
        for p in range(3):
            assert pos[b, label[b] == p, 2].max() <= \
                pos[b, label[b] == p + 1, 2].min() + 1e-6

    batch = synthetic_segmentation_batch(0, 3, 64, num_parts=4)
    assert batch["category"].shape == (3, 16)
    assert (batch["category"].sum(-1) == 1).all()
    assert batch["label"].max() < 4
