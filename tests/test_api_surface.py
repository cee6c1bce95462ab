"""The package exposes every public symbol the reference exports.

Reference surface: /root/reference/deltaconv/geometry/__init__.py:1-5
(star-exports of grad_div_mls, operators, connection, fps, utils),
/root/reference/deltaconv/nn/__init__.py:1-3,
/root/reference/deltaconv/models/__init__.py:1-3,
/root/reference/deltaconv/transforms/__init__.py:1-9.

Renames are part of the redesign and are pinned here so MIGRATION.md
stays truthful: ``BatchNorm1d`` -> ``BatchNorm`` (no "1d" axis
convention in the ``[..., N, C]`` layout).
"""

import deltaconv_tpu


REFERENCE_GEOMETRY = [
    # grad_div_mls.py
    "estimate_basis", "build_tangent_basis", "coords_projected",
    "gaussian_weights", "weighted_least_squares", "fit_vector_mapping",
    "build_grad_div",
    # operators.py
    "norm", "J", "I_J", "curl", "laplacian", "hodge_laplacian",
    # connection.py
    "build_transport", "angle_in_plane", "rotate_around",
    # fps.py / utils.py
    "geodesic_fps", "batch_dot",
]

REFERENCE_NN = {
    "DeltaConv": "DeltaConv",
    "MLP": "MLP",
    "VectorMLP": "VectorMLP",
    "ScalarVectorMLP": "ScalarVectorMLP",
    "ScalarVectorIdentity": "ScalarVectorIdentity",
    "VectorNonLin": "VectorNonLin",
    "BatchNorm1d": "BatchNorm",  # renamed (see module docstring)
}

REFERENCE_MODELS = [
    "DeltaNetBase", "DeltaNetClassification", "DeltaNetSegmentation",
]

REFERENCE_TRANSFORMS = [
    "NormalizeScale", "NormalizeArea", "NormalizeAxes", "RandomScale",
    "RandomTranslateGlobal", "RandomRotate", "RandomNormals",
    "SamplePoints", "GeodesicFPS",
]


def test_geometry_surface():
    for name in REFERENCE_GEOMETRY:
        assert hasattr(deltaconv_tpu.geometry, name), name


def test_nn_surface():
    for ours in REFERENCE_NN.values():
        assert hasattr(deltaconv_tpu.nn, ours), ours


def test_models_surface():
    for name in REFERENCE_MODELS:
        assert hasattr(deltaconv_tpu.models, name), name


def test_transforms_surface():
    for name in REFERENCE_TRANSFORMS:
        assert hasattr(deltaconv_tpu.transforms, name), name


def test_version_tuple():
    # Reference: deltaconv/__init__.py:6 exposes a version tuple.
    assert isinstance(deltaconv_tpu.version_info, tuple)
    assert isinstance(deltaconv_tpu.__version__, str)
