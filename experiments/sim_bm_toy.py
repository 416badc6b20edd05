"""Standalone Brownian-motion toy benchmark.

The analogue of reference /root/reference/experiments/sim_bm_toy_example.py
(279-341): train the Neural CDE under each interpolation scheme
(natural cubic, Hermite cubic with backward differences, rectilinear,
linear) for several repetitions and write a results table CSV with
train/test accuracy mean +- std.

Differences from the reference script: data generation and all
repetitions run on-device (the per-scheme repetition axis is vmapped —
five models train simultaneously), and the full 4096-path batch trains in
milliseconds per epoch on a TPU (see bench.py).

Usage::

    python experiments/sim_bm_toy.py [--epochs 100] [--paths 4096] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_neural_cdes_tpu.data.toy import brownian_motion_data
from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import (
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
)

SCHEMES = {
    "cubic": ("cubic", lambda x: natural_cubic_coeffs(x)),
    "cubic_hermite": ("hermite", hermite_cubic_coefficients_with_backward_differences),
    "rectilinear": ("rectilinear", lambda x: linear_interpolation_coeffs(x, rectilinear=0)),
    "linear": ("linear", lambda x: linear_interpolation_coeffs(x)),
}


def run_scheme(name, num_paths, n_points, epochs, hidden, width, reps, batch_size):
    interp, coeff_fn = SCHEMES[name]
    model = NeuralCDE(
        input_dim=2, hidden_dim=hidden, output_dim=1, hidden_hidden_dim=width,
        num_layers=2, interpolation=interp, return_sequences=True,
        adjoint=True, solver="rk4",
    )
    x_train, y_train = brownian_motion_data(jax.random.PRNGKey(0), num_paths, n_points)
    x_test, y_test = brownian_motion_data(jax.random.PRNGKey(1), 1024, n_points)
    c_train = coeff_fn(x_train)
    c_test = coeff_fn(x_test)
    y_fit = y_train  # rectilinear models filter back to L outputs themselves

    params = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(2), reps))
    opt = optax.adam(1e-3)
    opt_state = jax.vmap(opt.init)(params)

    def loss_fn(p, coeffs, labels):
        logits = model.apply(p, coeffs)[..., 0]
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    def step(p, s, coeffs, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, coeffs, labels)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None, None)))

    n_batches = max(1, num_paths // batch_size)
    # Warm the compile outside the timed region (on throwaway state, so
    # the training trajectory is untouched); sync via a host transfer —
    # block_until_ready is unreliable on the axon backend (bench.py:25-27).
    _p, _s, loss = vstep(params, opt_state, c_train[:batch_size], y_fit[:batch_size])
    float(loss.sum())
    del _p, _s
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in range(n_batches):
            sl = slice(b * batch_size, (b + 1) * batch_size)
            params, opt_state, loss = vstep(params, opt_state, c_train[sl], y_fit[sl])
    float(loss.sum())
    elapsed = time.perf_counter() - t0

    @jax.jit
    @jax.vmap
    def accuracy(p):
        def acc(coeffs, labels):
            logits = model.apply(p, coeffs)[..., 0]
            pred = jax.nn.sigmoid(logits[:, -1]) > 0.5
            return (pred == (labels[:, -1] > 0.5)).mean()

        return acc(c_train, y_train), acc(c_test, y_test)

    train_acc, test_acc = accuracy(params)
    return np.asarray(train_acc), np.asarray(test_acc), elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--paths", type=int, default=4096)
    ap.add_argument("--points", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--out", default="results/sim_bm/results_table.csv")
    args = ap.parse_args()

    rows = []
    for name in SCHEMES:
        train_acc, test_acc, elapsed = run_scheme(
            name, args.paths, args.points, args.epochs, args.hidden,
            args.width, args.reps, args.batch_size,
        )
        print(
            f"{name:>14}: train {train_acc.mean():.3f}+-{train_acc.std():.3f}  "
            f"test {test_acc.mean():.3f}+-{test_acc.std():.3f}  "
            f"({elapsed:.1f}s for {args.reps} reps x {args.epochs} epochs)"
        )
        rows.append(
            [name, train_acc.mean(), train_acc.std(), test_acc.mean(), test_acc.std()]
        )

    import pandas as pd

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    pd.DataFrame(
        rows, columns=["interpolation", "train_mean", "train_sd", "test_mean", "test_sd"]
    ).to_csv(args.out, index=False)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
