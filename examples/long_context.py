"""Long-context Neural CDEs: the two length weapons, end to end.

1. **Log-ODE windows** — compress a long path into per-window depth-d
   log-signatures (length/window knots, more channels) and solve the CDE
   over the compressed control (reference torchcde log_ode.py:110-133;
   README:251 "extra channels can be parallelised, extra length cannot").
2. **Sequence-pipelined solve with the O(1)-activation adjoint** — shard
   the knot axis across a device mesh and train through the reverse
   ppermute pipeline (no reference counterpart).

Runs on a virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/long_context.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.data.loader import apply_logsig_transform
from online_neural_cdes_tpu.models.ncde import NeuralCDE, make_spline
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.parallel.sequence import (
    make_sequence_mesh,
    pipelined_cde_solve,
)

B, L, C, H = 32, 257, 3, 16
rng = np.random.default_rng(0)
x = rng.normal(size=(B, L, C)).astype(np.float32) * 0.2
x[:, :, 0] = np.arange(L) / L
labels = jnp.asarray((x[:, :, 1].sum(1) > 0).astype(np.float32))

# ---- 1. log-ODE compression: 257 observations -> 33 knots x 6 channels
xl = apply_logsig_transform(x, depth=2, window=8)
print(f"log-ODE: {x.shape} -> {xl.shape}")
coeffs_l = linear_interpolation_coeffs(jnp.asarray(xl))
model_l = NeuralCDE(input_dim=xl.shape[-1], hidden_dim=H, output_dim=1,
                    hidden_hidden_dim=H, num_layers=1,
                    interpolation="linear", adjoint=True, solver="rk4")
params_l = model_l.init(jax.random.PRNGKey(0))
print("compressed-control logits:",
      np.asarray(model_l.apply(params_l, coeffs_l))[:3, 0])

# ---- 2. pipeline the raw path over the mesh, train via the O(1) adjoint
mesh = make_sequence_mesh(8)
spline = make_spline("linear", linear_interpolation_coeffs(jnp.asarray(x)))
model = NeuralCDE(input_dim=C, hidden_dim=H, output_dim=1,
                  hidden_hidden_dim=H, num_layers=1,
                  interpolation="linear", adjoint=False, solver="rk4")
field = model.field
fparams = model.init(jax.random.PRNGKey(1))["field"]
z0 = jnp.zeros((B, H), jnp.float32)


def loss(fp):
    zT = pipelined_cde_solve(
        spline, lambda t, z, p: field.apply(p, t, z), z0, fp,
        mesh=mesh, microbatches=4, adjoint=True,   # reverse-pipeline adjoint
    )
    logits = zT[:, 0]
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


val, grads = jax.value_and_grad(loss)(fparams)
gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads)) ** 0.5
print(f"pipelined adjoint: loss {float(val):.4f}, grad-norm {gnorm:.4f} "
      f"(256 knots sharded over {mesh.shape['seq']} devices)")
