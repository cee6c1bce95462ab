"""Shared CLI plumbing for the experiment scripts.

Mirrors the reference's per-script argparse vocabulary
(train_modelnet.py:145-226): optimization, DeltaConv, dataset, logging
and evaluation flags, plus TPU-specific extras (operator dtype, knn
method, data parallelism).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    # Optimization.
    p.add_argument("--batch_size", type=int, default=32,
                   help="Size of batch (default: 32)")
    p.add_argument("--epochs", type=int, default=250,
                   help="Number of epochs to train (default: 250)")
    p.add_argument("--lr", type=float, default=0.001,
                   help="Learning rate (default: 0.001)")
    p.add_argument("--momentum", type=float, default=0.9,
                   help="SGD momentum (default: 0.9)")
    # DeltaConv.
    p.add_argument("--k", type=int, default=20,
                   help="Number of nearest neighbors (default: 20)")
    p.add_argument("--grad_regularizer", type=float, default=0.001,
                   metavar="lambda",
                   help="WLS regularizer lambda (default: 0.001)")
    p.add_argument("--grad_kernel", type=float, default=1,
                   help="WLS kernel width relative to avg edge length")
    # Dataset.
    p.add_argument("--sampling_margin", type=int, default=8,
                   help="Oversampling factor before FPS (default: 8)")
    p.add_argument("--num_points", type=int, default=1024, metavar="N",
                   help="Number of points (default: 1024)")
    p.add_argument("--data_root", type=str, default="",
                   help="Dataset root (default: experiments/data/<name>)")
    # Logging / debugging.
    p.add_argument("--logdir", type=str, default="",
                   help="Log root; runs go to LOGDIR/runs/EXPERIMENT/TIME")
    p.add_argument("--seed", type=int, default=1,
                   help="random seed (default: 1)")
    # Evaluation.
    p.add_argument("--checkpoint", type=str, default="",
                   help="Checkpoint path/dir; evaluate-only when given")
    p.add_argument("--resume", type=str, default="",
                   help="Previous run dir (or its checkpoints dir): "
                        "restore the latest checkpoint, keep logging "
                        "there, and continue training")
    # TPU-specific knobs.
    p.add_argument("--operator_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="Dense-operator matmul dtype (default: bfloat16)")
    p.add_argument("--knn_method", type=str, default="exact",
                   choices=["exact", "approx"],
                   help="kNN search (approx = lax.approx_max_k)")
    p.add_argument("--no_data_parallel", action="store_true",
                   help="Disable sharding over local devices")
    return p


def finish_args(args, experiment_name: str, default_data_subdir: str):
    import os.path as osp

    here = osp.dirname(osp.realpath(__file__))
    args.experiment_name = experiment_name
    args.evaluating = args.checkpoint != ""
    if not args.data_root:
        args.data_root = osp.join(here, "data", default_data_subdir)
    if not args.logdir:
        args.logdir = here
    return args


def make_logger(args):
    from deltaconv_tpu.training import MetricsLogger, make_run_dir

    if args.evaluating:
        return MetricsLogger(None), None
    if getattr(args, "resume", ""):
        # Continue an interrupted run in place: metrics.jsonl appends,
        # checkpoints land next to the existing ones, and
        # fit(resume=True) restores the latest step.
        run_dir = args.resume
        cand = os.path.join(run_dir, "checkpoints")
        ckpt_dir = cand if os.path.isdir(cand) else run_dir
        logger = MetricsLogger(run_dir)
        print(f"Resuming run in {run_dir}")
        return logger, ckpt_dir
    run_dir = make_run_dir(args.logdir, args.experiment_name)
    logger = MetricsLogger(run_dir)
    logger.write_settings(args, args.experiment_name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    print(f"Logging to {run_dir}")
    return logger, ckpt_dir
