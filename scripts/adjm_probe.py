"""Flagship step time: rk4 backward vs midpoint/euler backward."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

B, L, C, H = 512, 100, 21, 128


def time_step(adjoint_method, n=25):
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=1, static_dim=10,
        hidden_hidden_dim=H, num_layers=2, interpolation="rectilinear",
        return_sequences=True, adjoint=True, solver="rk4", solver_unroll=4,
        adjoint_method=adjoint_method,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    labels = jnp.asarray(rng.integers(0, 2, size=(B, L)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0))

    def loss_fn(p):
        preds = model.apply(p, (static, coeffs))[..., 0]
        return optax.sigmoid_binary_cross_entropy(preds, labels).mean()

    @jax.jit
    def step(p):
        return jax.grad(loss_fn)(p)

    g = step(params)
    float(jax.tree.leaves(g)[0].sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            g = step(params)
        float(jax.tree.leaves(g)[0].sum())
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts)) * 1e3


for m in (None, "midpoint", "euler"):
    print(f"adjoint_method={m}: {time_step(m):7.2f} ms/step (fwd+bwd)")
