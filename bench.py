"""Benchmark: the five BASELINE.json driver configs on the real TPU.

1. Brownian-motion toy (sim_bm_toy_example.py): rectilinear NCDE, rk4 —
   full training epoch, compared against a from-scratch torch-CPU replica
   of the identical algorithm (torchdiffeq/GPU are not in this image; the
   reference's own hardware was "multiple GPUs" with no published numbers
   — BASELINE.md).
2. CharacterTrajectories-scale NCDE, linear vs rectilinear interpolation.
3. Beijing-TSR-scale NCDE, Hermite-cubic coefficients + bounded dopri5.
4. SpeechCommands-scale ODE-RNN and GRU-dt baselines.
5. MIMIC-scale online NCDE, adjoint rk4, fused + paired rectilinear scan
   (the flagship; multi-chip data parallelism is validated separately by
   the driver's dryrun_multichip on a virtual mesh).

Datasets cannot be downloaded in this image (zero egress), so configs 2-5
use synthetic data at the real datasets' shapes — the measured quantity is
compute (step time / NFE/s / effective TF/s), which depends on shapes, not
values.  Every run also executes a Pallas-vs-XLA parity assertion on the
hardware (forward + gradients), so each benchmark doubles as a TPU
correctness check of the fused kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"configs": [5 entries], "pallas_parity": "ok"}.

NOTE: on the experimental axon backend block_until_ready does not reliably
block; a host transfer (float()/np.asarray) is the only true sync.
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


def bench_jax(x, y, epochs=None):
    import jax
    import jax.numpy as jnp
    import optax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    if epochs is None:
        epochs = _TOY_EPOCHS
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

    # Epoch-fused dispatch (training.loop.make_epoch_step semantics): the
    # whole epoch is one lax.scan over the stacked batches — bit-identical
    # updates to the per-batch loop (tested), but a single dispatch+sync
    # round-trip per epoch.  On the tunneled axon backend a dispatch costs
    # 2-30 ms depending on the session, which would otherwise dominate this
    # tiny (sub-ms compute) epoch.
    cs = coeffs.reshape((STEPS_PER_EPOCH, BATCH) + coeffs.shape[1:])
    ls = labels.reshape((STEPS_PER_EPOCH, BATCH) + labels.shape[1:])

    @jax.jit
    def epoch_step(p, s, cs, ls):
        def body(carry, batch):
            p, s = carry
            p, s, value = step(p, s, batch[0], batch[1])
            return (p, s), value

        (p, s), values = jax.lax.scan(body, (p, s), (cs, ls))
        return p, s, values[-1]

    params, opt_state, loss = epoch_step(params, opt_state, cs, ls)
    float(loss)  # true sync (see module docstring)

    times = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = epoch_step(params, opt_state, cs, ls)
        float(loss)
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
        dx = xb[:, 1:] - xb[:, :-1]
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

    t0 = time.perf_counter()
    for _ in range(epochs):
        for i in range(STEPS_PER_EPOCH):
            xb = xt[i * BATCH:(i + 1) * BATCH]
            yb = yt[i * BATCH:(i + 1) * BATCH]
            loss = bce(forward(xb), yb)
            opt.zero_grad()
            loss.backward()
            opt.step()
    return (time.perf_counter() - t0) / epochs, float(loss.detach())


# ---------------------------------------------------------------------------
# Shared training-step timer for the shape-level configs
# ---------------------------------------------------------------------------

_TUNNEL_RT_S = None   # measured once in main(); None = assume healthy
_CHAINS = 3
_TOY_EPOCHS = 10


def _measure_tunnel_rt() -> float:
    """One dispatch+sync round-trip of a trivial op.  The axon tunnel's RT
    varies from ~2 ms to tens of SECONDS between sessions; when it is bad,
    the benchmark must spend its budget on long amortised chains with few
    syncs instead of timing out."""
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    float((x @ x).sum())  # warm the terminal + compile
    t0 = time.perf_counter()
    float((x @ x).sum())
    return time.perf_counter() - t0


def _calibrate_protocol():
    """Set chain/epoch counts from the measured tunnel RT; returns the RT
    in ms for the output JSON (measurement context for the record)."""
    global _TUNNEL_RT_S, _CHAINS, _TOY_EPOCHS
    _TUNNEL_RT_S = _measure_tunnel_rt()
    if _TUNNEL_RT_S > 1.0:        # pathological congestion
        _CHAINS, _TOY_EPOCHS = 1, 3
    elif _TUNNEL_RT_S > 0.1:
        _CHAINS, _TOY_EPOCHS = 2, 5
    return round(_TUNNEL_RT_S * 1000.0, 1)


def _time_train_step(model, inputs, labels, loss="bce", n=30, lr=1e-3):
    """Median of ``_CHAINS`` chains of ``n`` steps with ONE host sync per
    chain: per-step numbers amortise the tunnel round-trip over the chain
    (n=30 keeps the latency share under ~2 ms/step at a 50 ms RT); the
    chain count adapts to the measured RT (see _calibrate_protocol)."""
    import jax

    from online_neural_cdes_tpu.training.loop import init_adam_state, make_train_step

    params = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam_state(params)
    step = make_train_step(model, loss=loss, lr=lr, donate=False)
    params, opt_state, l = step(params, opt_state, inputs, labels, 1.0)
    float(l)
    times = []
    for _ in range(_CHAINS):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, l = step(params, opt_state, inputs, labels, 1.0)
        float(l)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times)) * 1000.0


def _field_flops(B, H, HH, I, num_layers=2):
    """FLOPs of one vector-field evaluation (trunk + head matmuls)."""
    trunk = H * HH + (num_layers - 1) * HH * HH
    return 2 * B * (trunk + HH * I * H)


def bench_chartraj():
    """Config 2: CharacterTrajectories shapes (L=182, C=3+time), linear vs
    rectilinear NCDE, rk4, 3-layer head sizes from the hyperopt range."""
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    B, L, C, H, HH = 256, 182, 4, 32, 32
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    labels = rng.integers(0, 20, size=(B,)).astype(np.int64)

    out = {}
    for interp, rect in (("linear", None), ("rectilinear", 0)):
        coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=rect)
        model = NeuralCDE(
            input_dim=C, hidden_dim=H, output_dim=20, hidden_hidden_dim=HH,
            num_layers=3, interpolation=interp, return_sequences=False,
            adjoint=False, solver="rk4", solver_unroll=4,
        )
        ms = _time_train_step(model, coeffs, jnp.asarray(labels), loss="ce")
        n_int = (2 * L - 2) if rect is not None else (L - 1)
        nfe = n_int * 4
        out[interp] = {
            "step_ms": round(ms, 2),
            "nfe_per_s": round(nfe / (ms / 1e3), 1),
            "eff_tf_s": round(3 * nfe * _field_flops(B, H, HH, C, 3) / (ms * 1e-3) / 1e12, 2),
        }
    return {
        "config": "CharacterTrajectories linear vs rectilinear NCDE (rk4)",
        "shape": f"B={B} L={L} C={C} H={H}",
        **out,
    }


def bench_beijing_hermite():
    """Config 3: Beijing TSR shapes (hourly L=24, C=9), Hermite-cubic
    coefficients + bounded-step dopri5 (regression head)."""
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        hermite_cubic_coefficients_with_backward_differences,
    )

    B, L, C, H, HH = 512, 24, 9, 32, 32
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    labels = rng.normal(size=(B,)).astype(np.float32)

    coeffs = hermite_cubic_coefficients_with_backward_differences(jnp.asarray(x))
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=HH,
        num_layers=2, interpolation="hermite", return_sequences=False,
        adjoint=False, solver="dopri5",
    )
    ms = _time_train_step(model, coeffs, jnp.asarray(labels), loss="mse")

    # Measured NFE at the trained tolerances (data/param dependent).
    import jax

    params = model.init(jax.random.PRNGKey(0))
    _, stats = model.apply(params, coeffs, return_stats=True)
    nfe = int(stats["nfe"])
    return {
        "config": "Beijing-TSR Hermite-cubic NCDE (dopri5, min_step=0.5)",
        "shape": f"B={B} L={L} C={C} H={H}",
        "step_ms": round(ms, 2),
        "nfe_fwd": nfe,
        "nfe_per_s": round(3 * nfe / (ms / 1e3), 1),
    }


def bench_speechcommands_baselines():
    """Config 4: SpeechCommands shapes (MFCC L=89, C=20+time), ODE-RNN and
    GRU-dt baselines through the same integrator."""
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.grud import prepare_gru_variant_data
    from online_neural_cdes_tpu.models.odernn import ODERNN
    from online_neural_cdes_tpu.models.rnn import RNN

    B, L, C = 1024, 89, 21
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L) / L
    labels = rng.integers(0, 10, size=(B,)).astype(np.int64)

    odernn = ODERNN(input_dim=C, hidden_dim=32, hidden_hidden_dim=32,
                    output_dim=10, num_layers=2, return_sequences=False)
    ms_ode = _time_train_step(odernn, jnp.asarray(x), jnp.asarray(labels), loss="ce")

    gru_inputs = prepare_gru_variant_data(x, variant="gru-dt")
    gru = RNN(input_dim=gru_inputs.shape[-1], hidden_dim=64, output_dim=10,
              gru=True, return_sequences=False)
    ms_gru = _time_train_step(gru, jnp.asarray(gru_inputs), jnp.asarray(labels),
                              loss="ce")
    nfe_ode = (L - 1) * 4  # rk4 evolve per step
    return {
        "config": "SpeechCommands ODE-RNN / GRU-dt baselines",
        "shape": f"B={B} L={L} C={C}",
        "odernn": {"step_ms": round(ms_ode, 2),
                   "nfe_per_s": round(3 * nfe_ode / (ms_ode / 1e3), 1)},
        "gru_dt": {"step_ms": round(ms_gru, 2)},
    }


def bench_flagship_step(n=30):
    """Config 5: MIMIC-scale online NCDE training step (B=512, 100 knots ->
    rectilinear length 199, H=HH=128, C=21, adjoint rk4, fused + paired
    rectilinear scan)."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

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
    ms = _time_train_step(model, (static, coeffs), labels, loss="bce", lr=5e-4, n=n)
    fwd_nfe = (2 * L - 2) * 4
    return {
        "config": "MIMIC-IV online NCDE (adjoint rk4, fused, paired rectilinear)",
        "shape": f"B={B} knots={2*L-1} C={C} H={H}",
        "step_ms": round(ms, 2),
        "nfe_per_s": round(fwd_nfe / (ms / 1e3), 1),
        "multichip": "validated by driver dryrun_multichip (virtual 8-dev mesh)",
    }, ms, fwd_nfe / (ms / 1e3)


def assert_pallas_parity():
    """TPU-gated correctness check: the Pallas fused kernel must match the
    XLA reference in forward values and gradients at 1e-5 (f32), making
    every bench run a hardware correctness check (VERDICT r1 #5)."""
    import jax
    import jax.numpy as jnp

    from online_neural_cdes_tpu.models.vector_fields import VectorField
    from online_neural_cdes_tpu.ops.kernels import (
        fused_field_available,
        fused_matmul_field,
        pack_fused_params,
    )

    if not fused_field_available():
        return "skipped (no TPU)"
    B, H, HH, I = 256, 128, 64, 21
    rng = np.random.default_rng(0)
    field = VectorField(input_dim=I, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(0))
    packed = pack_fused_params(params, H, I, pad=True)
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(B, I)), jnp.float32)

    def run(use_pallas):
        def loss(pk, z_):
            out = fused_matmul_field(pk["trunk"], pk["head_w"], pk["head_b"],
                                     z_, dx, H, I, use_pallas, "float32")
            return jnp.sum(out ** 2), out

        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                             has_aux=True)(packed, z)
        return out, grads

    out_p, g_p = run(True)
    out_x, g_x = run(False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    import jax

    def close(a, b):
        # Gradients scale with the sum-of-squares loss; compare relative to
        # each leaf's magnitude (forward diff ~5e-7 amplifies through g).
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(b)) + 1e-12
        assert np.max(np.abs(a - b)) <= 2e-4 * scale + 1e-5, (
            np.max(np.abs(a - b)), scale)

    jax.tree.map(close, g_p, g_x)
    return "ok"


def main():
    tunnel_rt_ms = _calibrate_protocol()
    parity = assert_pallas_parity()
    x, y = _make_data()
    jax_epoch_s, jax_loss = bench_jax(x, y)
    flagship, flagship_ms, flagship_nfe_s = bench_flagship_step()
    chartraj = bench_chartraj()
    beijing = bench_beijing_hermite()
    speech = bench_speechcommands_baselines()
    try:
        torch_epoch_s, _ = bench_torch(x, y)
    except Exception:
        torch_epoch_s = float("nan")

    toy = {
        "config": "Brownian-motion toy (rectilinear NCDE, rk4, adjoint, epoch-fused dispatch)",
        "shape": "4096 paths, 3 knots, H=10, width=256",
        "epoch_ms": round(jax_epoch_s * 1000.0, 3),
        "vs_torch_cpu": (
            round(torch_epoch_s / jax_epoch_s, 2)
            if np.isfinite(torch_epoch_s) else None
        ),
    }
    print(
        json.dumps(
            {
                "metric": "bm_toy_train_epoch_time",
                "value": round(jax_epoch_s * 1000.0, 3),
                "unit": "ms/epoch (4096 paths, rectilinear NCDE rk4, adjoint, epoch-fused)",
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
                "pallas_parity": parity,
                "tunnel_rt_ms": tunnel_rt_ms,
                "configs": [toy, chartraj, beijing, speech, flagship],
            }
        )
    )


if __name__ == "__main__":
    main()
