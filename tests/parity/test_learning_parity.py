"""Learning-level parity vs the EXECUTED reference implementation.

Trains the actual upstream model (/root/reference via the pyg shims)
and this framework on the SAME synthetic classification data, from the
SAME initial weights (imported through torch_import), with the same
optimizer (Adam 1e-3), loss (plain CE), batch order, and epoch budget
— then demands this framework generalizes at least as well (within a
noise margin) and fits the training set.

Multi-seed study behind the thresholds (8 seeds, 30 epochs, 64 train /
32 eval clouds, recorded 2026-08-17 in PERF.md):
  reference (executed)          eval acc 0.785 +- 0.088
  ours, reference inits         eval acc 0.816 +- 0.077
  ours, native torch-faithful   eval acc 0.738 +- 0.068
The single-seed run asserted here is deterministic (fixed torch and
JAX seeds, CPU execution).
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

from tools.pyg_shims import Data, load_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from deltaconv_tpu.data import synthetic_classification_batch  # noqa: E402
from deltaconv_tpu.models import DeltaNetClassification  # noqa: E402
from deltaconv_tpu.training import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from deltaconv_tpu.utils.torch_import import import_state_dict  # noqa: E402

B, N, CLASSES, EPOCHS = 16, 128, 4, 20


def _data():
    train = [synthetic_classification_batch(s, B, N, CLASSES)
             for s in range(4)]
    test = synthetic_classification_batch(100, 32, N, CLASSES)
    return train, test


def _to_torch(d, m):
    pos = torch.from_numpy(np.asarray(d["pos"]).reshape(m * N, 3))
    nrm = torch.from_numpy(np.asarray(d["normal"]).reshape(m * N, 3))
    data = Data(pos=pos, batch=torch.arange(m).repeat_interleave(N),
                norm=nrm)
    return data, torch.from_numpy(np.asarray(d["label"])).long()


@pytest.mark.slow
def test_trains_to_reference_level_from_identical_init():
    ref = load_reference()
    train, test = _data()

    torch.manual_seed(0)
    rmodel = ref.models.DeltaNetClassification(
        in_channels=3, num_classes=CLASSES, conv_channels=[16, 16],
        num_neighbors=12)
    init_sd = {k: np.asarray(v.detach().numpy())
               for k, v in rmodel.state_dict().items()}

    # --- reference, trained in torch --------------------------------
    dtr = [_to_torch(d, B) for d in train]
    dte, yte = _to_torch(test, 32)
    opt = torch.optim.Adam(rmodel.parameters(), lr=1e-3)
    rmodel.train()
    for _ in range(EPOCHS):
        for d, y in dtr:
            opt.zero_grad()
            torch.nn.functional.cross_entropy(rmodel(d), y).backward()
            opt.step()
    rmodel.eval()
    with torch.no_grad():
        ref_eval = float((rmodel(dte).argmax(-1) == yte).float().mean())
        ref_train = float(np.mean(
            [(rmodel(d).argmax(-1) == y).float().mean().item()
             for d, y in dtr]))

    # --- ours, trained in JAX from the SAME initial weights ---------
    params, bstats, _ = import_state_dict(init_sd)
    model = DeltaNetClassification(
        num_classes=CLASSES, conv_channels=(16, 16), num_neighbors=12,
        dense_operators=True, knn_method="exact")
    jtr = [{k: jnp.asarray(v) for k, v in d.items()} for d in train]
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jtr[0]["pos"],), optax.adam(1e-3),
        init_kwargs={"normal": jtr[0]["normal"]})
    state = state.replace(params=jax.tree.map(jnp.asarray, params),
                          batch_stats=jax.tree.map(jnp.asarray, bstats))
    step = jax.jit(make_train_step(model, smoothing=0.0))
    rng = jax.random.PRNGKey(100)
    for _ in range(EPOCHS):
        for d in jtr:
            rng, sub = jax.random.split(rng)
            state, _ = step(state, d, sub)

    @jax.jit
    def logits(pos, nrm):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pos, normal=nrm, train=False)

    our_train = float(np.mean([
        np.mean(np.asarray(logits(d["pos"], jnp.asarray(
            train[i]["normal"]))).argmax(-1) == train[i]["label"])
        for i, d in enumerate(jtr)]))
    our_eval = float(np.mean(np.asarray(
        logits(jnp.asarray(test["pos"]), jnp.asarray(test["normal"]))
    ).argmax(-1) == test["label"]))

    # Both implementations must fit the training set and generalize;
    # ours must be within noise (one eval-set sigma ~0.09) of the
    # reference.
    assert ref_train >= 0.95 and our_train >= 0.95, (ref_train, our_train)
    assert ref_eval >= 0.6, ref_eval
    assert our_eval >= ref_eval - 0.12, (our_eval, ref_eval)


def test_native_init_matches_torch_distribution():
    """The framework's default kernel init must reproduce torch
    Linear's U(+-1/sqrt(fan_in)) — lecun_normal (3x the variance)
    measurably degrades generalization (module docstring)."""
    from deltaconv_tpu.nn.init import torch_linear_bias, torch_linear_kernel

    k = jax.random.PRNGKey(0)
    fan_in = 256
    w = torch_linear_kernel(k, (fan_in, 512), jnp.float32)
    bound = 1.0 / np.sqrt(fan_in)
    assert float(jnp.abs(w).max()) <= bound + 1e-7
    # Uniform on [-b, b] has std b/sqrt(3).
    np.testing.assert_allclose(float(w.std()), bound / np.sqrt(3.0),
                               rtol=0.05)
    b = torch_linear_bias(fan_in)(k, (512,), jnp.float32)
    assert float(jnp.abs(b).max()) <= bound + 1e-7

    # And the models actually use it: a fresh init's first conv kernel
    # obeys the torch bound, not lecun_normal's unbounded support.
    model = DeltaNetClassification(num_classes=4, conv_channels=(16, 16),
                                   num_neighbors=12)
    batch = synthetic_classification_batch(0, 2, 64, 4)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.asarray(batch["pos"]),
                           normal=jnp.asarray(batch["normal"]),
                           train=False)
    kern = variables["params"]["deltanet_base"]["conv0"]["s_mlp_max"][
        "lin0"]["kernel"]
    assert float(jnp.abs(kern).max()) <= 1.0 / np.sqrt(kern.shape[0]) + 1e-7
