"""Same-host anchor measurements: the REFERENCE implementation (vendored
torchcde/torchdiffeq + src/ncde + src/benchmarks) and THIS framework on
this host's CPU, at the EXACT shapes bench.py measures on the TPU.

Three numbers (documented in docs/RESULTS.md):
  1. reference NeuralCDE flagship train step — B=512, L=100 raw
     (199 rectilinear knots), C=21, H=HH=128, adjoint rk4
     (bench.py::bench_flagship_step's shape);
  2. this framework, same step, same shape, pinned to the same CPU;
  3. reference ODE-RNN train step — B=1024, L=89, C=21, H=HH=32
     (bench.py::bench_speechcommands_baselines' shape; the reference
     _ODERNNFunc is fixed at one hidden layer vs the bench model's
     num_layers=2 — the reference side is very slightly CHEAPER).

Not part of bench.py (tens of seconds per reference step); run manually:
    python scripts/ref_flagship_cpu.py
"""
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference/modules/torchdiffeq")
sys.path.insert(0, "/root/reference/modules/torchcde")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

# src.ncde.attention imports autots (not installed; unused here) — stub.
autots = types.ModuleType("autots")
prep = types.ModuleType("autots.preprocessing")
prep.ForwardFill = prep.PadRaggedTensors = prep.SimplePipeline = object
autots.preprocessing = prep
sys.modules["autots"] = autots
sys.modules["autots.preprocessing"] = prep

import torch  # noqa: E402
import torchcde  # noqa: E402
from src.ncde import NeuralCDE as RefNCDE  # noqa: E402

B, L, C, H = 512, 100, 21, 128  # bench.py flagship: 199 rectilinear knots
rng = np.random.default_rng(0)
x = rng.normal(size=(B, L, C)).astype(np.float32)
x[:, :, 0] = np.arange(L)
print(f"torch threads: {torch.get_num_threads()}")

# ---- 1. reference flagship --------------------------------------------
coeffs = torchcde.linear_interpolation_coeffs(torch.tensor(x), rectilinear=0)
model = RefNCDE(
    input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=H,
    num_layers=2, interpolation="rectilinear", vector_field="original",
    vector_field_type="matmul", adjoint=True, solver="rk4",
    return_sequences=True,
)
labels = torch.tensor(rng.integers(0, 2, size=(B, L)).astype(np.float32))
opt = torch.optim.Adam(model.parameters(), lr=5e-4)
loss_fn = torch.nn.BCEWithLogitsLoss()
for step in range(2):
    t0 = time.perf_counter()
    opt.zero_grad()
    out = model(coeffs)[..., 0]
    loss = loss_fn(out, labels)
    loss.backward()
    opt.step()
    dt = time.perf_counter() - t0
    print(f"ref flagship step {step}: {dt:.1f} s  loss {loss.item():.4f}")
print(f"[1] REFERENCE flagship (B={B} L={L} H={H}) CPU step: {dt:.1f} s")

# ---- 2. this framework, same shape, same CPU --------------------------
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from online_neural_cdes_tpu.models.ncde import NeuralCDE  # noqa: E402
from online_neural_cdes_tpu.ops.interpolation import (  # noqa: E402
    linear_interpolation_coeffs,
)
from online_neural_cdes_tpu.training.loop import (  # noqa: E402
    init_adam_state, make_train_step,
)

coeffs_j = jax.block_until_ready(
    linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0))
ours = NeuralCDE(input_dim=C, hidden_dim=H, output_dim=1,
                 hidden_hidden_dim=H, num_layers=2,
                 interpolation="rectilinear", return_sequences=True,
                 adjoint=True, solver="rk4")
p = ours.init(jax.random.PRNGKey(0))
step_fn = make_train_step(ours.apply, loss="bce", lr=5e-4, donate=False)
o = init_adam_state(p)
labels_j = jnp.asarray(labels.numpy())
for i in range(3):
    t0 = time.perf_counter()
    p, o, l = step_fn(p, o, coeffs_j, labels_j, 1.0)
    lv = float(l)  # true sync
    dt = time.perf_counter() - t0
    print(f"ours step {i}: {dt:.2f} s  loss {lv:.4f}")
print(f"[2] THIS FRAMEWORK same shape, same CPU, steady step: {dt:.2f} s")

# ---- 3. reference ODE-RNN at the speech bench shape -------------------
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "ref_odernn", "/root/reference/src/benchmarks/odernn.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
B2, L2, C2, H2 = 1024, 89, 21, 32
om = m.ODERNN(input_dim=C2, hidden_dim=H2, output_dim=10,
              hidden_hidden_dim=H2, solver="rk4", gru=True,
              return_sequences=False)
x2 = torch.randn(B2, L2, C2)
y2 = torch.randint(0, 10, (B2,))
opt2 = torch.optim.Adam(om.parameters(), lr=1e-3)
lf2 = torch.nn.CrossEntropyLoss()
for i in range(2):
    t0 = time.perf_counter()
    opt2.zero_grad()
    loss2 = lf2(om(x2), y2)
    loss2.backward()
    opt2.step()
    dt2 = time.perf_counter() - t0
    print(f"ref odernn step {i}: {dt2:.2f} s  loss {loss2.item():.3f}")
print(f"[3] REFERENCE ODE-RNN (B={B2} L={L2} H={H2}) CPU step: {dt2:.2f} s")
