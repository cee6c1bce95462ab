"""Production inference engine: restore -> pad -> jit once -> predict.

The reference ships training CLIs only; serving a trained DeltaConv
model there means hand-rolling padding, batching and eval plumbing
around the torch modules. This module is the TPU-native serving
surface: it bundles checkpoint restore (orbax dirs or imported PyTorch
``.pt`` state_dicts), static-shape padding of arbitrary-size clouds
(XLA compiles one graph per (shape, masked) combination — ragged
inputs must never retrace), request batching, and the opt-in reduced
precision modes from PERF.md (bf16 serving config, int8 quantized
operators + quantized-domain gathers).

Typical use::

    engine = InferenceEngine.from_checkpoint(
        DeltaNetClassification(num_classes=40),
        "runs/modelnet/checkpoints", num_points=1024,
        precision="bfloat16")
    logits = engine.predict(list_of_clouds)   # [M, 40]

Reference parity anchors: eval semantics of
``/root/reference/experiments/train_modelnet.py:104-121`` (padded,
masked, train=False forward); precision modes are additive.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InferenceEngine", "apply_precision", "load_variables"]

# Unit-z padding normal keeps build_tangent_basis well-defined on
# padded rows (they are masked out of every statistic downstream).
_PAD_NORMAL = np.asarray([0.0, 0.0, 1.0], np.float32)


def load_variables(path: str):
    """Loads model variables ``{"params", "batch_stats"}`` from an
    orbax checkpoint directory (latest step, or a direct ``step_N``
    path) or a PyTorch ``.pt``/``.pth`` state_dict (via the weight
    importer). Structure-free: no template TrainState or model init
    is required."""
    if path.endswith((".pt", ".pth")):
        from .utils.torch_import import import_torch_checkpoint

        params, batch_stats = import_torch_checkpoint(path)
        return {"params": params, "batch_stats": batch_stats}

    import os

    from .training.checkpoint import _checkpointer, latest_step

    if not os.path.basename(path).startswith("step_"):
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = os.path.join(os.path.abspath(path), f"step_{step}")
    raw = _checkpointer().restore(os.path.abspath(path))
    return {"params": raw["params"],
            "batch_stats": raw.get("batch_stats", {})}


def apply_precision(model, precision: Optional[str]):
    """Clones ``model`` into a serving precision config: ``None``
    keeps it as built; ``float32`` strips low-precision settings;
    ``bfloat16``/``int8`` select the PERF.md serving modes."""
    if precision is None:
        return model
    if precision == "float32":
        return model.clone(compute_dtype=None, operator_dtype=None)
    if precision == "bfloat16":
        return model.clone(compute_dtype="bfloat16",
                           operator_dtype="bfloat16")
    if precision == "int8":
        # Quantized operators + quantized-domain gathers (PERF.md:
        # +20% over exact, logit deviation ~0.5%, argmax-stable).
        # Only the dense-operator path consumes operator_dtype — a
        # silent no-op here would leave the caller believing the
        # accuracy-changing mode is active.
        if not getattr(model, "dense_operators", True):
            raise ValueError(
                "precision='int8' requires dense_operators=True (the "
                "coefficient-operator path has no quantized form)")
        return model.clone(compute_dtype="bfloat16",
                           operator_dtype="int8")
    raise ValueError(f"unknown precision {precision!r}; expected "
                     "float32 | bfloat16 | int8")


class InferenceEngine:
    """Batched fixed-shape serving wrapper around a DeltaNet model.

    Args:
      model: a ``DeltaNetClassification``/``DeltaNetSegmentation``
        (or any flax module with the same call protocol).
      variables: ``{"params", "batch_stats"}`` tree (see
        :func:`load_variables`).
      num_points: static point count every request is padded to.
        Requests with more points are rejected (subsample upstream —
        silently dropping geometry would change answers).
      batch_size: static request batch; partial batches are filled by
        replicating the first cloud and the filler outputs discarded.
      precision: ``None`` (as built) | ``"float32"`` | ``"bfloat16"``
        | ``"int8"``.
    """

    def __init__(self, model, variables, *, num_points: int,
                 batch_size: int = 32,
                 precision: Optional[str] = None):
        self.model = apply_precision(model, precision)
        self.variables = variables
        self.num_points = int(num_points)
        self.batch_size = int(batch_size)
        self._jitted = {}  # (masked, has_normal, has_category) -> fn
        self._aug_jit = {}  # augment fn -> jitted augment (voting)

    @classmethod
    def from_checkpoint(cls, model, path: str, *, num_points: int,
                        batch_size: int = 32,
                        precision: Optional[str] = None):
        return cls(model, load_variables(path), num_points=num_points,
                   batch_size=batch_size, precision=precision)

    # -- forward ----------------------------------------------------

    def _forward(self, masked: bool, has_normal: bool,
                 has_category: bool):
        key = (masked, has_normal, has_category)
        if key not in self._jitted:
            model = self.model

            @jax.jit
            def fwd(variables, pos, normal, mask, category):
                kwargs = {}
                if has_category:
                    kwargs["category"] = category
                return model.apply(
                    variables, pos,
                    normal=normal if has_normal else None,
                    point_mask=mask if masked else None,
                    train=False, **kwargs)

            self._jitted[key] = fwd
        return self._jitted[key]

    def warmup(self, masked: Optional[bool] = None,
               has_normal: bool = True, has_category: bool = False):
        """Triggers compilation (first compile is ~20-40 s on TPU)
        outside the serving path. ``masked=None`` compiles BOTH the
        uniform (all clouds exactly ``num_points``) and ragged graphs
        — ``predict`` picks between them per request, so warming only
        one still leaves a live-path compile. Segmentation
        deployments that pass categories must warm with
        ``has_category=True`` (the category input changes the graph)."""
        b, n = self.batch_size, self.num_points
        pos = jnp.zeros((b, n, 3)).at[:, :, 2].set(
            jnp.linspace(0.0, 1.0, n))
        normal = jnp.tile(jnp.asarray(_PAD_NORMAL), (b, n, 1))
        mask = jnp.ones((b, n), bool)
        cat = jnp.eye(16)[jnp.zeros((b,), jnp.int32)]
        variants = (False, True) if masked is None else (masked,)
        for m in variants:
            self._forward(m, has_normal, has_category)(
                self.variables, pos, normal, mask, cat
            ).block_until_ready()

    # -- request assembly -------------------------------------------

    def _pad_one(self, pos, normal):
        pos = np.asarray(pos, np.float32)
        n = pos.shape[0]
        if n > self.num_points:
            raise ValueError(
                f"cloud has {n} > num_points={self.num_points} points; "
                "subsample upstream (e.g. transforms.SamplePoints)")
        pad = self.num_points - n
        if pad:
            pos = np.concatenate(
                [pos, np.zeros((pad, 3), np.float32)])
        if normal is not None:
            normal = np.asarray(normal, np.float32)
            if normal.shape[:1] != (n,):
                raise ValueError(
                    f"normals have {normal.shape[0]} rows for a cloud "
                    f"of {n} points — they must match per cloud")
            if pad:
                normal = np.concatenate(
                    [normal, np.tile(_PAD_NORMAL, (pad, 1))])
        mask = np.arange(self.num_points) < n
        return pos, normal, mask, n

    @staticmethod
    def _encode_category(c):
        """Int label -> 16-wide one-hot (ShapeNet convention, bounds
        checked — jit would silently clamp an out-of-range gather);
        array-likes pass through at their own width."""
        if np.ndim(c) == 0:
            cid = int(c)
            if not 0 <= cid < 16:
                raise ValueError(
                    f"category id {cid} outside the 16-category "
                    "convention; pass a pre-encoded vector instead")
            return np.eye(16, dtype=np.float32)[cid]
        return np.asarray(c, np.float32)

    def predict(self, clouds: Sequence, normals: Optional[Sequence] = None,
                categories: Optional[Sequence[int]] = None):
        """Runs the model on ``clouds`` (sequence of ``[N_i, 3]``
        arrays, ragged N_i allowed).

        Args:
          normals: optional matching ``[N_i, 3]`` sequence (all-or-none
            — the model estimates normals only for a whole batch).
          categories: optional object-category inputs (segmentation
            models with ``categorical_vector=True``): int labels are
            one-hot encoded to the ShapeNet-convention ``[B, 16]``
            (ids outside ``0..15`` are rejected); already-encoded
            vectors pass through at their own width.

        Returns: classification -> ``[M, num_classes]`` ndarray;
        segmentation -> list of ``[N_i, num_classes]`` ndarrays
        (padding rows trimmed). Zero clouds -> an empty list (the
        output kind is only known after a forward runs).
        """
        logits, sizes = self._run(clouds, normals, categories)
        if logits is None:
            return []
        if logits.ndim == 3:  # segmentation: trim padding rows per cloud
            return [logits[i, :sizes[i]] for i in range(len(sizes))]
        return logits

    def predict_voting(self, clouds: Sequence,
                       normals: Optional[Sequence] = None,
                       categories: Optional[Sequence[int]] = None,
                       num_votes: int = 10, augment=None, seed: int = 0):
        """The reference voting protocol as a serving call
        (test_shapenet.py:79-96): ``num_votes`` stochastically
        augmented forward passes, logits summed before the caller's
        argmax. ``augment``: jittable ``(key, pos, normal) ->
        (pos, normal)`` on padded ``[B, N, 3]`` batches; defaults to
        the reference eval augmentation (RandomScale 4/5..5/4 +
        RandomTranslateGlobal 0.1). Returns the same shapes as
        :meth:`predict`."""
        if num_votes < 1:
            raise ValueError(f"num_votes must be >= 1, got {num_votes}")
        if len(clouds) == 0:
            return []
        if augment is None:
            from .transforms.augment import augment_classification
            augment = augment_classification
        aug = self._aug_jit.get(augment)
        if aug is None:  # one jit cache per augment fn, kept across calls
            if len(self._aug_jit) >= 8:
                # Callers passing a fresh closure per request must not
                # leak one compiled executable per call.
                self._aug_jit.clear()
            aug = self._aug_jit[augment] = jax.jit(augment)
        # Pad/stack/upload ONCE; only the augmentation key changes
        # between votes.
        batches, sizes, masked, has_normal, has_category = \
            self._assemble(clouds, normals, categories)
        fwd = self._forward(masked, has_normal, has_category)
        rng = jax.random.PRNGKey(seed)
        total = None
        for _ in range(num_votes):
            outs = []
            for pos, normal, mask, cat, keep in batches:
                # One key per (vote, chunk): reusing a vote's key across
                # chunks would give clouds in the same intra-batch slot
                # of different chunks IDENTICAL augmentation draws on
                # every vote, correlating vote diversity across chunks.
                rng, key = jax.random.split(rng)
                p, n = aug(key, pos, normal if has_normal else None)
                n = n if n is not None else normal
                out = np.asarray(fwd(self.variables, p, n, mask, cat),
                                 np.float32)
                outs.append(out[:keep])
            logits = np.concatenate(outs, axis=0)
            total = logits if total is None else total + logits
        if total.ndim == 3:
            return [total[i, :sizes[i]] for i in range(len(sizes))]
        return total

    def predict_sharded(self, cloud, normal=None, category=None,
                        mesh=None):
        """Runs ONE cloud too large for a single chip point-sharded
        over the device mesh (``parallel.point_sharding``): each device
        owns a row block, operators build locally, gathers/pools
        complete with collectives. ``num_points``/``batch_size`` do not
        apply — the cloud is padded to a multiple of the mesh size.
        Returns ``[num_classes]`` (classification, replicated) or the
        trimmed ``[N, num_classes]`` (segmentation). ``mesh`` defaults
        to a 1-D "points" mesh over all devices."""
        from jax.sharding import Mesh

        from .parallel import (
            pad_cloud,
            point_sharded_classification,
            point_sharded_segmentation,
        )

        if self.model.operator_dtype == "int8":
            raise ValueError(
                "predict_sharded has no int8 form (the point-sharded "
                "path uses coefficient operators); serve sharded at "
                "precision=None/float32/bfloat16")
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("points",))
        n = np.asarray(cloud).shape[0]
        pos, nrm, pm = pad_cloud(jnp.asarray(cloud, jnp.float32),
                                 mesh.devices.size,
                                 None if normal is None
                                 else jnp.asarray(normal, jnp.float32))
        seg = hasattr(self.model, "categorical_vector")
        if seg:
            cat = (None if category is None else
                   jnp.asarray(self._encode_category(category)))
            out = point_sharded_segmentation(
                mesh, self.model, self.variables, pos, normal=nrm,
                point_mask=pm, category=cat)
            return np.asarray(out, np.float32)[:n]
        out = point_sharded_classification(
            mesh, self.model, self.variables, pos, normal=nrm,
            point_mask=pm)
        return np.asarray(out, np.float32)

    def _assemble(self, clouds, normals, categories):
        """Pads and stacks all clouds into device-ready batches (one
        host->device upload). Returns ``(batches, sizes, masked,
        has_normal, has_category)`` where every batch entry is
        ``(pos, normal, mask, cat, keep)`` and ``keep`` is the number
        of non-filler rows."""
        m = len(clouds)
        has_normal = normals is not None
        has_category = categories is not None
        padded = [
            self._pad_one(clouds[i], normals[i] if has_normal else None)
            for i in range(m)
        ]
        sizes = [p[3] for p in padded]
        masked = any(s != self.num_points for s in sizes)

        batches = []
        bsz = self.batch_size
        for start in range(0, m, bsz):
            chunk = padded[start:start + bsz]
            fill = bsz - len(chunk)
            chunk = chunk + [chunk[0]] * fill  # replicated filler rows
            pos = jnp.asarray(np.stack([c[0] for c in chunk]))
            normal = (jnp.asarray(np.stack([c[1] for c in chunk]))
                      if has_normal else pos)  # unused when not has_normal
            mask = jnp.asarray(np.stack([c[2] for c in chunk]))
            if has_category:
                cats = list(categories[start:start + bsz])
                cats += [cats[0]] * fill
                cat = jnp.asarray(np.stack(
                    [self._encode_category(c) for c in cats]))
            else:
                cat = jnp.zeros((bsz, 16))
            batches.append((pos, normal, mask, cat, bsz - fill))
        return batches, sizes, masked, has_normal, has_category

    def _run(self, clouds, normals, categories):
        """Pads, batches, and runs one forward pass over all clouds;
        returns ``(stacked_logits, sizes)`` (``(None, None)`` for zero
        clouds)."""
        if len(clouds) == 0:
            return None, None
        batches, sizes, masked, has_normal, has_category = \
            self._assemble(clouds, normals, categories)
        fwd = self._forward(masked, has_normal, has_category)
        outs = []
        for pos, normal, mask, cat, keep in batches:
            out = np.asarray(
                fwd(self.variables, pos, normal, mask, cat),
                np.float32)
            outs.append(out[:keep])
        return np.concatenate(outs, axis=0), sizes
