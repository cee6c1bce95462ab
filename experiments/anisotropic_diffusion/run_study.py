"""Anisotropic-diffusion study runner (the reference notebook as a CLI).

Trains each operator-family ResNet to reproduce n steps of Perona-
Malik anisotropic diffusion on a test image (paper Figure 2 /
supplement Figures 2-3) and reports the final L1 error per
architecture. Optionally writes the prediction images as PNGs.

Usage::

    python experiments/anisotropic_diffusion/run_study.py \
        --steps 20 --iterations 200 --save-images out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.realpath(__file__)),
                    os.pardir, os.pardir)
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from architectures import ALL_NETS
from diffusion import anisotropic_diffusion_nsteps, make_test_image


def train_net(net_cls, image, target, iterations, num_layers, width, lr,
              seed=1):
    model = net_cls(num_layers=num_layers, out_channels=width,
                    in_channels=image.shape[-1])
    params = model.init(jax.random.PRNGKey(seed), image)

    # Adam + weight decay 1e-5 + StepLR(50, 0.1) per the notebook.
    def schedule(step):
        return lr * 0.1 ** (step // 50)

    tx = optax.chain(optax.add_decayed_weights(1e-5), optax.adam(schedule))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, image)
            return jnp.mean(jnp.abs(pred - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(iterations):
        params, opt_state, loss = step(params, opt_state)
    pred = model.apply(params, image)
    final_l1 = float(jnp.mean(jnp.abs(pred - target)))
    return np.asarray(pred), final_l1


def save_png(path, img):
    from PIL import Image

    arr = np.clip(np.asarray(img)[0, :, :, 0], 0, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=20,
                   help="Perona-Malik diffusion steps for the target")
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--num_layers", type=int, default=16)
    p.add_argument("--width", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--size", type=int, default=128,
                   help="Test image size")
    p.add_argument("--save-images", type=str, default="",
                   help="Directory for input/target/prediction PNGs")
    p.add_argument("--out-jsonl", type=str, default="",
                   help="Append one JSON line per architecture")
    args = p.parse_args()

    image = jnp.asarray(make_test_image(args.size))
    target = anisotropic_diffusion_nsteps(image, args.steps)

    if args.save_images:
        os.makedirs(args.save_images, exist_ok=True)
        save_png(os.path.join(args.save_images, "input.png"), image)
        save_png(os.path.join(args.save_images, "target.png"), target)

    print(f"Perona-Malik target: {args.steps} steps; training "
          f"{args.iterations} iterations per net\n")
    results = []
    for net_cls in ALL_NETS:
        pred, l1 = train_net(net_cls, image, target, args.iterations,
                             args.num_layers, args.width, args.lr)
        results.append((net_cls.net_name(), l1))
        print(f"{net_cls.net_name():<14s} final L1 = {l1:.5f}")
        if args.out_jsonl:
            with open(args.out_jsonl, "a") as f:
                f.write(json.dumps({
                    "net": net_cls.net_name(), "final_l1": round(l1, 6),
                    "steps": args.steps, "iterations": args.iterations,
                    "num_layers": args.num_layers, "width": args.width,
                    "lr": args.lr, "size": args.size,
                }) + "\n")
        if args.save_images:
            fn = net_cls.net_name().replace("+", "p").lower() + ".png"
            save_png(os.path.join(args.save_images, fn), pred)

    best = min(results, key=lambda r: r[1])
    print(f"\nBest fit: {best[0]} (L1 {best[1]:.5f})")


if __name__ == "__main__":
    main()
