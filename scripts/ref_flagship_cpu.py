"""One-off anchor measurement: the REFERENCE implementation itself
(vendored torchcde/torchdiffeq + src/ncde NeuralCDE) running the flagship
MIMIC-scale training step on this host's CPU.

Not part of bench.py (minutes per step); run manually:
    python scripts/ref_flagship_cpu.py
Documented in docs/RESULTS.md as the same-host same-algorithm baseline
for the flagship step-time claim.
"""
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference/modules/torchdiffeq")
sys.path.insert(0, "/root/reference/modules/torchcde")
sys.path.insert(0, "/root/reference")

# src.ncde.attention imports autots (not installed; unused here) — stub.
autots = types.ModuleType("autots")
prep = types.ModuleType("autots.preprocessing")
prep.ForwardFill = prep.PadRaggedTensors = prep.SimplePipeline = object
autots.preprocessing = prep
sys.modules["autots"] = autots
sys.modules["autots.preprocessing"] = prep

import torch  # noqa: E402
import torchcde  # noqa: E402
from src.ncde import NeuralCDE  # noqa: E402

B, L, C, H = 512, 199, 21, 128
rng = np.random.default_rng(0)
x = rng.normal(size=(B, L, C)).astype(np.float32)
x[:, :, 0] = np.arange(L)

t0 = time.perf_counter()
coeffs = torchcde.linear_interpolation_coeffs(torch.tensor(x), rectilinear=0)
coeff_s = time.perf_counter() - t0
print(f"rectilinear coeffs ({tuple(coeffs.shape)}): {coeff_s:.1f} s")

model = NeuralCDE(
    input_dim=C, hidden_dim=H, output_dim=1, hidden_hidden_dim=H,
    num_layers=2, interpolation="rectilinear", vector_field="original",
    vector_field_type="matmul", adjoint=True, solver="rk4",
    return_sequences=True,
)
labels = torch.tensor(
    rng.integers(0, 2, size=(B, L)).astype(np.float32))  # ::2-filtered rows
opt = torch.optim.Adam(model.parameters(), lr=5e-4)
loss_fn = torch.nn.BCEWithLogitsLoss()

print(f"torch threads: {torch.get_num_threads()}")
times = []
for step in range(2):  # step 0 warms any lazy init
    t0 = time.perf_counter()
    opt.zero_grad()
    out = model(coeffs)[..., 0]
    loss = loss_fn(out, labels)
    loss.backward()
    opt.step()
    dt = time.perf_counter() - t0
    times.append(dt)
    print(f"step {step}: {dt:.1f} s  loss {float(loss):.4f}")
print(f"REFERENCE flagship train step on this host's CPU: {times[-1]:.1f} s")
