"""Quickstart: train an online Neural CDE end to end.

Generates irregular synthetic data (NaN = missing), builds rectilinear
interpolation coefficients, trains a NeuralCDE with the adjoint solver,
and evaluates — the minimal version of what `training/harness.py` does
for real datasets.

Run from the repo root:  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.training.loop import init_adam_state, make_train_step


def make_data(n=256, length=16, channels=4, seed=0):
    """Irregularly observed series: channel 0 is time, NaN = unobserved."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, length, channels)).astype(np.float32).cumsum(axis=1)
    x[:, :, 0] = np.arange(length)                       # time channel
    x[rng.random(size=x.shape) < 0.3] = np.nan           # 30% missing
    x[:, :, 0] = np.arange(length)
    # Online binary labels: sign of a running statistic, NaN past a random
    # per-series end (the temporal loss masks them).
    labels = (np.nan_to_num(x[:, :, 1]) > 0).astype(np.float32)
    ends = rng.integers(length // 2, length, size=n)
    for i, e in enumerate(ends):
        labels[i, e:] = np.nan
    return x, labels


def main():
    x, labels = make_data()
    # Rectilinear = the causal (online) interpolation: time advances, then
    # values update, so the model never peeks ahead.
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)

    model = NeuralCDE(
        input_dim=x.shape[-1], hidden_dim=16, output_dim=1,
        hidden_hidden_dim=32, num_layers=1,
        interpolation="rectilinear", return_sequences=True,
        adjoint=True, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)
    # Mixed precision: add compute_dtype="bfloat16" to run the fwd+bwd at
    # bf16 storage (f32 master weights) — halves weight/coefficient HBM
    # traffic on TPU.
    step = make_train_step(model, loss="bce", lr=1e-3, donate=False)

    labels_j = jnp.asarray(labels)
    for epoch in range(20):
        params, opt_state, loss = step(params, opt_state, coeffs, labels_j, 1.0)
        if epoch % 5 == 0:
            print(f"epoch {epoch:3d}  loss {float(loss):.4f}")

    logits = model.apply(params, coeffs)[..., 0]
    mask = ~np.isnan(labels)
    acc = ((np.asarray(logits) > 0) == (labels > 0.5))[mask].mean()
    print(f"final loss {float(loss):.4f}  masked train accuracy {acc:.3f}")


if __name__ == "__main__":
    main()
