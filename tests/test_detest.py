"""Classic nonstiff DETEST battery for the adaptive solvers (the analogue
of reference modules/torchdiffeq/tests/DETEST/detest.py): representative
problems from the A (single equations), B (small systems), C (moderate
systems), D (orbit) and E (higher-order) classes, verified against a tight
scipy solve_ivp reference solution.

Enright & Pryce problem definitions are standard published mathematics;
this file implements them directly, not from the reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from online_neural_cdes_tpu.ops.solvers import odeint


def _a1(t, y):
    return -y


def _a2(t, y):
    return -0.5 * y**3


def _a3(t, y):
    return y * np.cos(t)


def _a4(t, y):
    return 0.25 * y * (1.0 - y / 20.0)


def _a5(t, y):
    return (y - t) / (y + t)


def _b1(t, y):
    y1, y2 = y[..., 0], y[..., 1]
    return np.stack([2.0 * (y1 - y1 * y2), -(y2 - y1 * y2)], axis=-1)


def _b3(t, y):
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    return np.stack([-y1, y1 - y2**2, y2**2], axis=-1)


def _c1(t, y):
    # Linear chain: y1' = -y1; yi' = y_{i-1} - y_i.
    out = np.empty_like(y)
    out[..., 0] = -y[..., 0]
    out[..., 1:] = y[..., :-1] - y[..., 1:]
    return out


def _d1(t, y, eps=0.1):
    # Two-body orbit, eccentricity 0.1: (x, y, x', y').
    x, yy, vx, vy = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    r3 = (x**2 + yy**2) ** 1.5
    return np.stack([vx, vy, -x / r3, -yy / r3], axis=-1)


def _e3(t, y):
    # Duffing-type: y'' = y^3/6 - y + 2 sin(2.78535 t).
    y1, y2 = y[..., 0], y[..., 1]
    return np.stack([y2, y1**3 / 6.0 - y1 + 2.0 * np.sin(2.78535 * t)], axis=-1)


_EPS_D1 = 0.1
PROBLEMS = {
    "A1": (_a1, np.array([1.0]), 20.0),
    "A2": (_a2, np.array([1.0]), 20.0),
    "A3": (_a3, np.array([1.0]), 20.0),
    "A4": (_a4, np.array([1.0]), 20.0),
    "A5": (_a5, np.array([4.0]), 20.0),
    "B1": (_b1, np.array([1.0, 3.0]), 20.0),
    "B3": (_b3, np.array([1.0, 0.0, 0.0]), 20.0),
    "C1": (_c1, np.concatenate([[1.0], np.zeros(9)]), 20.0),
    "D1": (
        _d1,
        np.array([1.0 - _EPS_D1, 0.0, 0.0,
                  np.sqrt((1.0 + _EPS_D1) / (1.0 - _EPS_D1))]),
        20.0,
    ),
    "E3": (_e3, np.array([0.0, 0.0]), 20.0),
}


def _truth(f, y0, t_end):
    sol = solve_ivp(lambda t, y: f(t, y), (0.0, t_end), y0,
                    method="DOP853", rtol=1e-12, atol=1e-12)
    assert sol.success
    return sol.y[:, -1]


@pytest.mark.smoke
def test_detest_smoke_instance():
    """Fast tier: one DETEST problem through the adaptive dopri5 path."""
    test_detest_problem("A1", "dopri5")


@pytest.mark.parametrize("name", sorted(PROBLEMS))
@pytest.mark.parametrize("method", ["dopri5", "dopri8", "bosh3"])
def test_detest_problem(name, method):
    f_np, y0_np, t_end = PROBLEMS[name]
    truth = _truth(f_np, y0_np, t_end)

    jf = _JAX_RHS[name]
    rtol, atol = (1e-7, 1e-9) if method != "bosh3" else (1e-6, 1e-8)
    ys = odeint(lambda t, y, a: jf(t, y), jnp.asarray(y0_np, jnp.float64),
                jnp.array([0.0, t_end]), method=method, rtol=rtol, atol=atol)
    final = np.asarray(ys[-1])
    scale = np.maximum(np.abs(truth), 1.0)
    # Local tolerance bounds per-step error; global error over t=20
    # accumulates, especially for the 3rd-order bosh3.
    tol = 2e-3 if method == "bosh3" else 1e-5
    np.testing.assert_allclose(final / scale, truth / scale, atol=tol,
                               err_msg=f"{name}/{method}")


_JAX_RHS = {
    "A1": lambda t, y: -y,
    "A2": lambda t, y: -0.5 * y**3,
    "A3": lambda t, y: y * jnp.cos(t),
    "A4": lambda t, y: 0.25 * y * (1.0 - y / 20.0),
    "A5": lambda t, y: (y - t) / (y + t),
    "B1": lambda t, y: jnp.stack(
        [2.0 * (y[0] - y[0] * y[1]), -(y[1] - y[0] * y[1])]
    ),
    "B3": lambda t, y: jnp.stack([-y[0], y[0] - y[1] ** 2, y[1] ** 2]),
    "C1": lambda t, y: jnp.concatenate([-y[:1], y[:-1] - y[1:]]),
    "D1": lambda t, y: jnp.stack(
        [y[2], y[3],
         -y[0] / (y[0] ** 2 + y[1] ** 2) ** 1.5,
         -y[1] / (y[0] ** 2 + y[1] ** 2) ** 1.5]
    ),
    "E3": lambda t, y: jnp.stack(
        [y[1], y[0] ** 3 / 6.0 - y[0] + 2.0 * jnp.sin(2.78535 * t)]
    ),
}
