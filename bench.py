"""Benchmark: Brownian-motion toy NCDE training (the reference's standalone
benchmark config — experiments/sim_bm_toy_example.py: rectilinear scheme,
rk4 fixed step, 4096 paths, hidden=10, width=256).

Measures the time to train one epoch (4096 paths, batch 1024) of the
rectilinear Neural CDE with our TPU framework, and the same algorithm with
a from-scratch PyTorch implementation on the host CPU (torchdiffeq/GPU are
not available in this image; the reference's own hardware was "multiple
GPUs" with no published numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = torch_cpu_epoch_time / our_epoch_time (higher is better).
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 1024
NUM_PATHS = 4096
N_POINTS = 3
HIDDEN = 10
WIDTH = 256
STEPS_PER_EPOCH = NUM_PATHS // BATCH


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    times = np.linspace(0.0, 1.0, N_POINTS).astype(np.float32)
    inc = rng.normal(size=(NUM_PATHS, N_POINTS - 1)) * np.sqrt(1.0 / (N_POINTS - 1))
    bm = np.concatenate([np.zeros((NUM_PATHS, 1)), np.cumsum(inc, 1)], 1)
    x = np.stack([np.tile(times, (NUM_PATHS, 1)), bm], -1).astype(np.float32)
    y = np.tile((bm[:, -1:] > 0), (1, N_POINTS)).astype(np.float32)
    return x, y


def bench_jax(x, y, epochs=10):
    import jax
    import jax.numpy as jnp
    import optax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    model = NeuralCDE(
        input_dim=2, hidden_dim=HIDDEN, output_dim=1, hidden_hidden_dim=WIDTH,
        num_layers=2, interpolation="rectilinear", return_sequences=True,
        adjoint=True, solver="rk4", solver_unroll=4,
    )
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(y)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, c, l):
        logits = model.apply(p, c)[..., 0]
        return optax.sigmoid_binary_cross_entropy(logits, l).mean()

    @jax.jit
    def step(p, s, c, l):
        loss, grads = jax.value_and_grad(loss_fn)(p, c, l)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    batches = [
        (coeffs[i * BATCH:(i + 1) * BATCH], labels[i * BATCH:(i + 1) * BATCH])
        for i in range(STEPS_PER_EPOCH)
    ]
    # Warm up (compile) + one full epoch to stabilise caches.
    params, opt_state, loss = step(params, opt_state, *batches[0])
    float(loss)  # NOTE: on the experimental axon backend block_until_ready
    # does not reliably block; a host transfer is the only true sync.

    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        for c, l in batches:
            params, opt_state, loss = step(params, opt_state, c, l)
        float(loss)  # chains through every update of the epoch
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(loss)


def bench_torch(x, y, epochs=1):
    """From-scratch torch implementation of the same algorithm (rectilinear
    linear interpolation + piecewise rk4 CDE + sequence BCE + Adam)."""
    import torch

    torch.manual_seed(0)

    def rectilinear_prep(data):
        rep = data.repeat_interleave(2, dim=-2).clone()
        rep[..., :-1, 0] = rep[..., 1:, 0]
        return rep[..., :-1, :]

    xt = rectilinear_prep(torch.as_tensor(x))          # (N, 2L-1, 2)
    yt = torch.as_tensor(y)
    L2 = xt.shape[1]

    class Field(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l0 = torch.nn.Linear(HIDDEN, WIDTH)
            self.l1 = torch.nn.Linear(WIDTH, WIDTH)
            self.l2 = torch.nn.Linear(WIDTH, HIDDEN * 2)

        def forward(self, z):
            h = torch.relu(self.l0(z))
            h = torch.relu(self.l1(h))
            return torch.tanh(self.l2(h)).view(-1, HIDDEN, 2)

    field = Field()
    initial = torch.nn.Linear(2, HIDDEN)
    readout = torch.nn.Linear(HIDDEN, 1)
    params = (
        list(field.parameters()) + list(initial.parameters()) + list(readout.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-3)
    bce = torch.nn.functional.binary_cross_entropy_with_logits

    def forward(xb):
        dx = xb[:, 1:] - xb[:, :-1]                    # piecewise dX (dt=1)
        z = initial(xb[:, 0])
        zs = [z]
        for i in range(L2 - 1):
            dxi = dx[:, i]

            def f(zz):
                return torch.einsum("bhi,bi->bh", field(zz), dxi)

            k1 = f(z)
            k2 = f(z + k1 / 3.0)
            k3 = f(z + k2 - k1 / 3.0)
            k4 = f(z + k1 - k2 + k3)
            z = z + (k1 + 3.0 * (k2 + k3) + k4) / 8.0
            zs.append(z)
        return readout(torch.stack(zs, 1))[:, ::2, 0]

    n_steps = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for i in range(STEPS_PER_EPOCH):
            xb = xt[i * BATCH:(i + 1) * BATCH]
            yb = yt[i * BATCH:(i + 1) * BATCH]
            loss = bce(forward(xb), yb)
            opt.zero_grad()
            loss.backward()
            opt.step()
            n_steps += 1
    return (time.perf_counter() - t0) / epochs, float(loss)


def bench_flagship_step(n=10):
    """MIMIC-scale online NCDE training step (B=512, 100 knots ->
    rectilinear length 199, H=HH=128, C=21, adjoint rk4, fused kernel)."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
    from online_neural_cdes_tpu.training.loop import init_adam_state, make_train_step

    B, L, C, H = 512, 100, 21, 128
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, static_dim=10,
        hidden_hidden_dim=H, num_layers=2, interpolation="rectilinear",
        return_sequences=True, adjoint=True, solver="rk4", solver_unroll=4,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)
    step = make_train_step(model, loss="bce", lr=5e-4, donate=False)
    params, opt_state, loss = step(params, opt_state, (static, coeffs), labels, 1.0)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, loss = step(params, opt_state, (static, coeffs), labels, 1.0)
    float(loss)
    ms = (time.perf_counter() - t0) / n * 1000.0
    fwd_nfe = (2 * L - 2) * 4  # vector-field evaluations per forward solve
    return ms, fwd_nfe / (ms / 1000.0)


def main():
    x, y = _make_data()
    jax_epoch_s, jax_loss = bench_jax(x, y)
    flagship_ms, flagship_nfe_s = bench_flagship_step()
    try:
        torch_epoch_s, _ = bench_torch(x, y)
    except Exception:
        torch_epoch_s = float("nan")
    print(
        json.dumps(
            {
                "metric": "bm_toy_train_epoch_time",
                "value": round(jax_epoch_s * 1000.0, 3),
                "unit": "ms/epoch (4096 paths, rectilinear NCDE rk4, adjoint)",
                "vs_baseline": (
                    round(torch_epoch_s / jax_epoch_s, 2)
                    if np.isfinite(torch_epoch_s)
                    else None
                ),
                "baseline_note": (
                    "from-scratch torch (CPU, same host) implementation of the "
                    "identical algorithm; reference published no GPU numbers"
                ),
                "flagship_mimic_scale_step_ms": round(flagship_ms, 2),
                "flagship_vector_field_nfe_per_s": round(flagship_nfe_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
