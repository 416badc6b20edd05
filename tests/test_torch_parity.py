"""Numerical parity against an independent PyTorch implementation.

torchdiffeq/torchcde are not installed here, so the oracle is a
from-scratch torch implementation of the same algorithm (rectilinear
linear interpolation -> piece-pinned RK4(3/8) CDE solve -> readout), with
weights copied from the JAX model.  Outputs must agree to float32
round-off — the strongest cross-framework evidence that the TPU solve
computes the reference algorithm."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

B, L, C, H, HH = 8, 7, 3, 6, 12


def _torch_forward(params, coeffs_np, hidden_dim, input_dim):
    """Independent torch replica of the rectilinear rk4 NCDE forward."""
    t = {k: torch.tensor(np.asarray(v)) for k, v in {
        "w0": params["field"]["trunk"][0]["w"], "b0": params["field"]["trunk"][0]["b"],
        "w1": params["field"]["trunk"][1]["w"], "b1": params["field"]["trunk"][1]["b"],
        "wo": params["field"]["out"]["w"], "bo": params["field"]["out"]["b"],
        "wi": params["initial"]["w"], "bi": params["initial"]["b"],
        "wf": params["final"]["w"], "bf": params["final"]["b"],
    }.items()}
    x = torch.tensor(coeffs_np)          # (B, 2L-1, C) rectilinear knots
    dx = x[:, 1:] - x[:, :-1]            # unit spacing

    def field(z):
        u = torch.relu(z @ t["w0"] + t["b0"])
        u = torch.relu(u @ t["w1"] + t["b1"])
        a = torch.tanh(u @ t["wo"] + t["bo"])
        return a.view(-1, hidden_dim, input_dim)

    z = x[:, 0] @ t["wi"] + t["bi"]
    zs = [z]
    for i in range(x.shape[1] - 1):
        dxi = dx[:, i]

        def f(zz):
            return torch.einsum("bhi,bi->bh", field(zz), dxi)

        k1 = f(z)
        k2 = f(z + k1 / 3.0)
        k3 = f(z + k2 - k1 / 3.0)
        k4 = f(z + k1 - k2 + k3)
        z = z + (k1 + 3.0 * (k2 + k3) + k4) / 8.0
        zs.append(z)
    hidden = torch.stack(zs, dim=1)
    out = hidden @ t["wf"] + t["bf"]
    return out[:, ::2].numpy()           # rectilinear ::2 filtering


@pytest.mark.smoke
def test_ncde_matches_torch_replica():
    model = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=HH,
        num_layers=2, interpolation="rectilinear", return_sequences=True,
        adjoint=False, solver="rk4", fused=False,
    )
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    x[0, 3, 1] = np.nan
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)

    ours = np.asarray(model.apply(params, coeffs))
    theirs = _torch_forward(params, np.asarray(coeffs), H, C)
    assert ours.shape == theirs.shape == (B, L, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # The fused path agrees too.
    fused = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=HH,
        num_layers=2, interpolation="rectilinear", return_sequences=True,
        adjoint=False, solver="rk4", fused=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, coeffs)), theirs, rtol=1e-4, atol=1e-5
    )
