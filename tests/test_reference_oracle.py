"""Reference-oracle parity suite (VERDICT r3 next #4).

Imports the reference's vendored torchcde/torchdiffeq (the strongest
correctness oracle available in this image) and asserts NUMERICAL
agreement with this framework, reproducing the reference's own test
batteries against the reference code itself:

- coefficient builders vs torchcde outputs (linear, rectilinear
  interleave-lag, natural cubic v0/v1 with NaN paths) —
  reference interpolation_linear.py:131-180, interpolation_cubic.py:193-265
- spline evaluate/derivative vs the torchcde classes
- fixed-grid / adaptive / Adams trajectories + NFE accounting vs
  torchdiffeq, incl. the repo's min_step mod semantics
  (reference tests/odeint_tests.py:222-240)
- gradients: our direct jax.grad == reference discrete backprop, and
  our interval adjoint == reference odeint_adjoint (continuous adjoint)
  — reference tests/gradient_tests.py:34-104 semantics
- log-ODE windows vs a closed-form depth-2 BCH oracle (signatory is not
  installed; straight-line log-signature composition is exact at depth 2)
  — reference log_ode.py:15-77

Two DOCUMENTED divergences are pinned here rather than asserted equal:
(a) at a knot time the reference's bucketize-based spline lookup returns
    the piece ENDING there, so fixed-grid stages evaluated exactly on a
    knot of a LINEAR control read the previous piece's slope (the Perturb
    machinery exists to patch this); our piece-pinned scan always uses
    the enclosing interval's piece.  Parity is therefore asserted on
    C^1 controls (cubic) for knot-stage methods and on interior-stage /
    adaptive paths for linear controls.
(b) our dopri8 is DOP853 (scipy's tableau, blended 5th/3rd error) rather
    than the reference's plain dopri8; both are asserted against the
    analytic solution instead of each other.

Everything runs in float64 (conftest enables x64) so agreement bounds
are round-off, not tolerance mush.  Marked ``oracle``: excluded from the
smoke tier, included in the default/full suite.
"""

import os
import sys
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/modules"
pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not present"
    ),
]


@pytest.fixture(scope="module")
def oracle():
    for sub in ("torchdiffeq", "torchcde"):
        p = os.path.join(REF, sub)
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    import torchcde
    import torchdiffeq

    return torch, torchcde, torchdiffeq



def _install_autots_stub():
    """The reference's src/ modules import autots (not installed in this
    image; pinned jambo6/autots@v0.0.8 in reference requirements.txt:2 —
    same author as the reference).  Functional minimal stubs of the three
    transforms the reference's AttentionNeuralCDE.reduce_hidden_state
    actually calls (attention.py:100-118): PadRaggedTensors pads a list of
    (Li, C) tensors to (N, max Li, C) with NaN, ForwardFill fills NaN
    forward along the length axis, SimplePipeline chains transforms.

    The stub semantics are tied to the reference's OWN usage of the real
    library (we wrote the stubs, so the pin would otherwise be vacuous):
    grud.py:244-256 ForwardFills NaN-holed controls and then still
    torch.isnan-checks the result — so ForwardFill propagates last
    observations forward and leaves LEADING NaNs in place (feature_means
    fill them afterwards); get_data/common.py:169-170 builds NaN rows as
    the padding value for same-size returns, and attention.py's pipeline
    ForwardFills immediately after PadRaggedTensors — coherent only if
    the pad value IS NaN (a zero/constant pad would need no fill and
    would corrupt the final-hidden-state gather).  A runtime self-check
    below asserts the chained stubs leave a padded tail constant at the
    last real row.  One shared stub keeps the registration
    order-independent across oracle tests (and matches
    scripts/ref_flagship_cpu.py); tests that only need the NAMES to exist
    are unaffected by the functionality."""
    import types

    import torch

    class PadRaggedTensors:
        def transform(self, tensors):
            if isinstance(tensors, torch.Tensor):
                return tensors
            max_len = max(t.shape[0] for t in tensors)
            out = torch.full(
                (len(tensors), max_len) + tuple(tensors[0].shape[1:]),
                float("nan"), dtype=tensors[0].dtype,
            )
            for i, t in enumerate(tensors):
                out[i, : t.shape[0]] = t
            return out

    class ForwardFill:
        def transform(self, x):
            idx = torch.arange(x.shape[1]).view(1, -1, 1).expand_as(x).clone()
            idx[torch.isnan(x)] = 0
            idx = idx.cummax(dim=1).values
            return torch.gather(x, 1, idx)

    class SimplePipeline:
        def __init__(self, steps):
            self.steps = steps

        def transform(self, x):
            for step in self.steps:
                x = step.transform(x)
            return x

    # Self-check of the documented semantics the oracle pin rests on:
    # NaN-pad + forward fill leaves a ragged row's padded tail CONSTANT at
    # its last real observation (attention.py's final-state gather depends
    # on exactly this), and leading NaNs survive the fill (grud.py's
    # feature_means path depends on that).
    ragged = [torch.tensor([[1.0], [2.0]]),
              torch.tensor([[float("nan")], [5.0], [6.0]])]
    chained = SimplePipeline([PadRaggedTensors(), ForwardFill()]).transform(
        ragged)
    assert torch.equal(chained[0], torch.tensor([[1.0], [2.0], [2.0]]))
    assert torch.isnan(chained[1][0, 0]) and torch.equal(
        chained[1][1:], torch.tensor([[5.0], [6.0]]))

    autots = sys.modules.get("autots") or types.ModuleType("autots")
    prep = sys.modules.get("autots.preprocessing") or types.ModuleType(
        "autots.preprocessing")
    prep.ForwardFill = ForwardFill
    prep.PadRaggedTensors = PadRaggedTensors
    prep.SimplePipeline = SimplePipeline
    autots.preprocessing = prep
    sys.modules["autots"] = autots
    sys.modules["autots.preprocessing"] = prep


def _nan_series(B=3, L=10, C=4, seed=0, scale=1.0):
    """Random batch with interior NaNs, a NaN start row, a NaN tail value
    and one all-NaN channel — the reference's hard imputation cases
    (interpolation_cubic.py:56-167)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, C)) * scale
    x[rng.random(size=(B, L, C)) < 0.25] = np.nan
    x[1, :, 2] = np.nan
    x[0, 0, :] = np.nan
    x[2, -1, 1] = np.nan
    return x


# ---------------------------------------------------------------------------
# Coefficient builders vs torchcde
# ---------------------------------------------------------------------------


def test_linear_coeffs_match_torchcde(oracle):
    """linear_interpolation_coeffs == reference interpolation_linear.py:131."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    x = _nan_series()
    ours = np.asarray(linear_interpolation_coeffs(jnp.asarray(x)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = torchcde.linear_interpolation_coeffs(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)


def test_rectilinear_coeffs_match_torchcde(oracle):
    """rectilinear= interleave-lag == reference _prepare_rectilinear_interpolation
    (interpolation_linear.py:87-128): identical 2L-1 knot tensor."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs

    x = _nan_series()
    x[:, :, 0] = np.arange(x.shape[1])  # NaN-free increasing time channel
    ours = np.asarray(linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = torchcde.linear_interpolation_coeffs(
            torch.tensor(x), rectilinear=0
        ).numpy()
    assert ours.shape == ref.shape == (x.shape[0], 2 * x.shape[1] - 1, x.shape[2])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)


@pytest.mark.parametrize("version", [0, 1])
def test_natural_cubic_coeffs_match_torchcde(oracle, version):
    """Packed [a|b|2c|3d] coefficients == reference natural_cubic_coeffs
    (_version=1, interpolation_cubic.py:233) / deprecated
    natural_cubic_spline_coeffs (_version=0, :193), NaN paths included."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops.interpolation import (
        natural_cubic_coeffs,
        natural_cubic_spline_coeffs,
    )

    x = _nan_series(seed=3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        if version == 1:
            ours = np.asarray(natural_cubic_coeffs(jnp.asarray(x)))
            ref = torchcde.natural_cubic_coeffs(torch.tensor(x)).numpy()
        else:
            ours = np.asarray(natural_cubic_spline_coeffs(jnp.asarray(x)))
            ref = torchcde.natural_cubic_spline_coeffs(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_cubic_spline_eval_deriv_match_torchcde(oracle):
    """CubicSpline.evaluate/derivative == reference NaturalCubicSpline
    (interpolation_cubic.py:315-336) at interior, knot and endpoint times."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops import interpolation as I

    x = _nan_series(seed=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_sp = torchcde.NaturalCubicSpline(
            torchcde.natural_cubic_coeffs(torch.tensor(x))
        )
    our_sp = I.CubicSpline.create(I.natural_cubic_coeffs(jnp.asarray(x)))
    for tt in (0.0, 0.3, 2.7, 5.5, 8.999, 9.0):
        # f64 time tensor: torch.tensor(float) defaults to f32, and the
        # reference's _interpret_t upcasts the already-rounded value.
        tt_ref = torch.tensor(tt, dtype=torch.float64)
        np.testing.assert_allclose(
            np.asarray(our_sp.evaluate(tt)),
            ref_sp.evaluate(tt_ref).numpy(),
            rtol=0, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(our_sp.derivative(tt)),
            ref_sp.derivative(tt_ref).numpy(),
            rtol=0, atol=1e-12,
        )


def test_linear_interp_eval_match_torchcde(oracle):
    """LinearInterpolation.evaluate == reference LinearInterpolation
    (interpolation_linear.py:183-234) at interior times (values at knots
    are two-sided-consistent; derivatives at knots differ by the
    documented bucketize-side divergence and are asserted on interior
    points only)."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops import interpolation as I

    x = _nan_series(seed=5)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_sp = torchcde.LinearInterpolation(
            torchcde.linear_interpolation_coeffs(torch.tensor(x))
        )
    our_sp = I.LinearInterpolation.create(
        I.linear_interpolation_coeffs(jnp.asarray(x))
    )
    for tt in (0.0, 0.25, 3.5, 6.75, 8.5, 9.0):
        np.testing.assert_allclose(
            np.asarray(our_sp.evaluate(tt)),
            ref_sp.evaluate(torch.tensor(tt, dtype=torch.float64)).numpy(),
            rtol=0, atol=1e-14,
        )
    for tt in (0.25, 3.5, 6.75, 8.5):
        np.testing.assert_allclose(
            np.asarray(our_sp.derivative(tt)),
            ref_sp.derivative(torch.tensor(tt, dtype=torch.float64)).numpy(),
            rtol=0, atol=1e-14,
        )


# ---------------------------------------------------------------------------
# Solvers vs torchdiffeq (linear ODE dy/dt = A y; NFE via the reference's
# own counter idiom, tests/problems.py:7-56)
# ---------------------------------------------------------------------------

_A = np.array(
    [[-0.1, 2.0, 0.0], [-2.0, -0.1, 0.5], [0.0, -0.5, -0.3]]
)
_Y0 = np.array([1.0, -0.5, 0.3])


def _ref_solve(oracle, tg, method, rtol=1e-7, atol=1e-9, options=None):
    torch, _, torchdiffeq = oracle

    class F(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.nfe = 0
            self.A = torch.nn.Parameter(torch.tensor(_A))

        def forward(self, t, y):
            self.nfe += 1
            return y @ self.A.T

    f = F()
    with torch.no_grad():
        ys = torchdiffeq.odeint(
            f, torch.tensor(_Y0), torch.tensor(tg),
            rtol=rtol, atol=atol, method=method, options=options or {},
        ).numpy()
    return ys, f.nfe


def _our_solve(tg, method, rtol=1e-7, atol=1e-9, options=None):
    from online_neural_cdes_tpu.ops import solvers as S

    ys, stats = S.odeint(
        lambda t, y, a: y @ jnp.asarray(_A).T,
        jnp.asarray(_Y0), jnp.asarray(tg),
        rtol=rtol, atol=atol, method=method, options=dict(options or {}),
        return_stats=True,
    )
    return np.asarray(ys), int(stats["nfe"])


@pytest.mark.parametrize("method", ["euler", "midpoint", "rk4"])
def test_fixed_grid_trajectories_exact(oracle, method):
    """Fixed-grid steppers bit-match the reference (incl. rk4's 3/8 rule,
    rk_common.py:106-114) on the same grid."""
    tg = np.linspace(0.0, 4.0, 9)
    ref, nfe_ref = _ref_solve(oracle, tg, method)
    ours, nfe_ours = _our_solve(tg, method)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-14)
    assert nfe_ours == nfe_ref


@pytest.mark.parametrize("method", ["bosh3", "fehlberg2", "adaptive_heun"])
def test_adaptive_trajectory_and_nfe_exact(oracle, method):
    """Same tableau + same Hairer initial step + same step controller =>
    the accept/reject sequence, hence the NFE count, matches the
    reference EXACTLY (rk_common.py:216-305, misc.py:32-89)."""
    tg = np.linspace(0.0, 2.0, 5)
    ref, nfe_ref = _ref_solve(oracle, tg, method)
    ours, nfe_ours = _our_solve(tg, method)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-4)
    assert nfe_ours == nfe_ref, (nfe_ours, nfe_ref)


def test_dopri5_trajectory_matches(oracle):
    """dopri5 trajectories agree at solver tolerance and NFE within 10%
    (the interp-vs-landing bookkeeping differs slightly; the controller
    behaviour is pinned exactly by the three tableaux above)."""
    tg = np.linspace(0.0, 4.0, 9)
    ref, nfe_ref = _ref_solve(oracle, tg, "dopri5")
    ours, nfe_ours = _our_solve(tg, "dopri5")
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)
    assert abs(nfe_ours - nfe_ref) <= 0.10 * nfe_ref, (nfe_ours, nfe_ref)


def test_dopri8_vs_analytic(oracle):
    """Our dopri8 is DOP853 (documented divergence (b)): both it and the
    reference's dopri8 must sit within tolerance of the ANALYTIC
    solution expm(A t) y0."""
    import scipy.linalg

    tg = np.linspace(0.0, 4.0, 9)
    exact = np.stack([scipy.linalg.expm(_A * t) @ _Y0 for t in tg])
    ref, _ = _ref_solve(oracle, tg, "dopri8", rtol=1e-10, atol=1e-12)
    ours, _ = _our_solve(tg, "dop853", rtol=1e-10, atol=1e-12)
    # The reference's dopri8 accumulates ~4e-7 global error even at
    # rtol=1e-10 on this problem; our DOP853 stays under 1e-7.
    np.testing.assert_allclose(ref, exact, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ours, exact, rtol=0, atol=1e-7)


def test_min_step_nfe_semantics(oracle):
    """The repo's bounded-step mod (rk_common.py:123-125,273-276):
    min_step=2 forces far fewer evaluations than min_step=0, with the
    same thresholds the reference's own TestMinMaxStep asserts
    (tests/odeint_tests.py:222-240)."""
    tg = np.linspace(0.0, 4.0, 9)
    for min_step, bound in ((0.0, None), (2.0, 50)):
        opts = {"min_step": min_step, "max_step": 5.0}
        _, nfe_ref = _ref_solve(oracle, tg, "dopri5", options=dict(opts))
        _, nfe_ours = _our_solve(tg, "dopri5", options=dict(opts))
        if bound is None:
            assert nfe_ref > 100 and nfe_ours > 100, (nfe_ref, nfe_ours)
        else:
            assert nfe_ref < bound and nfe_ours < bound, (nfe_ref, nfe_ours)


def test_scipy_solver_matches(oracle):
    """scipy fallback == reference ScipyWrapperODESolver (scipy_wrapper.py:9)
    — same underlying LSODA, same min/max-step plumbing."""
    tg = np.linspace(0.0, 4.0, 9)
    opts = {"solver": "LSODA", "min_step": 0.0, "max_step": float("inf")}
    ref, _ = _ref_solve(oracle, tg, "scipy_solver", rtol=1e-9, atol=1e-11,
                        options=dict(opts))
    ours, _ = _our_solve(tg, "scipy_solver", rtol=1e-9, atol=1e-11,
                         options=dict(opts))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-8)


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_matches(oracle, method):
    """Adams-Bashforth(-Moulton) == reference fixed_adams.py.  Implicit
    uses a grid dense enough that the reference's functional iteration
    converges (its non-convergence warning path has a Python-3 bug);
    explicit uses the short grid where the order-growth schedule is
    identical (beyond ~order 8 the two high-order coefficient/order
    selections drift at the 1e-5 level — both remain valid AB schemes)."""
    tg = np.linspace(0.0, 2.0, 41) if method == "implicit_adams" else np.linspace(0.0, 4.0, 9)
    ref, _ = _ref_solve(oracle, tg, method)
    ours, _ = _our_solve(tg, method)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-11)


def test_odeint_gradients_match_both_modes(oracle):
    """d(loss)/d(y0, params) through adaptive dopri5 at tight tolerance
    matches BOTH the reference's discrete backprop and its continuous
    adjoint (reference tests/gradient_tests.py:34-104: at rtol=1e-9/
    atol=1e-12 the two coincide to ~1e-5; we assert all three agree)."""
    torch, _, torchdiffeq = oracle
    rng = np.random.default_rng(1)
    W = rng.normal(size=(3, 3)) * 0.5
    b = rng.normal(size=(3,)) * 0.1
    y0 = rng.normal(size=(3,))
    tg = np.linspace(0.0, 2.0, 6)
    g = rng.normal(size=(6, 3))

    class F(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.W = torch.nn.Parameter(torch.tensor(W))
            self.b = torch.nn.Parameter(torch.tensor(b))

        def forward(self, t, y):
            return torch.tanh(y @ self.W.T + self.b)

    def ref_grads(adjoint):
        f = F()
        y0t = torch.tensor(y0, requires_grad=True)
        fn = torchdiffeq.odeint_adjoint if adjoint else torchdiffeq.odeint
        ys = fn(f, y0t, torch.tensor(tg), rtol=1e-9, atol=1e-12)
        (ys * torch.tensor(g)).sum().backward()
        return y0t.grad.numpy(), f.W.grad.numpy(), f.b.grad.numpy()

    from online_neural_cdes_tpu.ops import solvers as S

    def our_loss(args):
        y0_, W_, b_ = args
        ys = S.odeint(
            lambda t, y, a: jnp.tanh(y @ a[0].T + a[1]),
            y0_, jnp.asarray(tg), (W_, b_),
            rtol=1e-9, atol=1e-12, method="dopri5",
            options={"differentiable": True},
        )
        return jnp.sum(ys * jnp.asarray(g))

    ours = jax.grad(our_loss)((jnp.asarray(y0), jnp.asarray(W), jnp.asarray(b)))
    for adjoint in (False, True):
        for got, want in zip(ours, ref_grads(adjoint)):
            np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-7)


# ---------------------------------------------------------------------------
# cdeint gradients vs torchcde (reference solver.py:140-238 + adjoint.py)
# ---------------------------------------------------------------------------

_CDE = dict(B=4, L=8, C=3, H=5)


def _cde_problem(seed=1):
    rng = np.random.default_rng(seed)
    B, L, C, H = _CDE["B"], _CDE["L"], _CDE["C"], _CDE["H"]
    x = rng.normal(size=(B, L, C)) * 0.5
    x[rng.random(size=(B, L, C)) < 0.2] = np.nan
    params = {
        "Wf": rng.normal(size=(H, H)) * 0.3,
        "bf": rng.normal(size=(H,)) * 0.1,
        "Wo": rng.normal(size=(H, H * C)) * 0.2,
        "bo": rng.normal(size=(H * C,)) * 0.05,
    }
    z0 = rng.normal(size=(B, H)) * 0.5
    g = rng.normal(size=(B, L, H))
    return x, params, z0, g


def _ref_cde_grads(oracle, x, p, z0, g, adjoint):
    torch, torchcde, _ = oracle
    H, C = _CDE["H"], _CDE["C"]

    class CF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for k, v in p.items():
                setattr(self, k, torch.nn.Parameter(torch.tensor(v)))

        def forward(self, t, z):
            u = torch.relu(z @ self.Wf.T + self.bf)
            return torch.tanh(u @ self.Wo + self.bo).view(-1, H, C)

    f = CF()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        X = torchcde.NaturalCubicSpline(
            torchcde.natural_cubic_coeffs(torch.tensor(x))
        )
    z0t = torch.tensor(z0, requires_grad=True)
    kw = dict(adjoint_params=tuple(f.parameters())) if adjoint else {}
    zs = torchcde.cdeint(
        X, f, z0t, X.grid_points, adjoint=adjoint, method="rk4", **kw
    )
    (zs * torch.tensor(g)).sum().backward()
    return (
        zs.detach().numpy(),
        z0t.grad.numpy(),
        {k: getattr(f, k).grad.numpy() for k in p},
    )


def _our_cde_grads(x, p, z0, g, adjoint):
    from online_neural_cdes_tpu.ops import interpolation as I
    from online_neural_cdes_tpu.ops.cdeint import cdeint

    H, C = _CDE["H"], _CDE["C"]
    X = I.CubicSpline.create(I.natural_cubic_coeffs(jnp.asarray(x)))

    def field(t, z, pp):
        u = jax.nn.relu(z @ pp["Wf"].T + pp["bf"])
        return jnp.tanh(u @ pp["Wo"] + pp["bo"]).reshape(z.shape[:-1] + (H, C))

    def loss(args):
        z0_, pp = args
        zs = cdeint(X, field, z0_, X.grid_points, pp, adjoint=adjoint,
                    method="rk4")
        return jnp.sum(zs * jnp.asarray(g)), zs

    pj = {k: jnp.asarray(v) for k, v in p.items()}
    (_, zs), (gz0, gp) = jax.value_and_grad(loss, has_aux=True)(
        (jnp.asarray(z0), pj))
    return np.asarray(zs), np.asarray(gz0), {k: np.asarray(v) for k, v in gp.items()}


def test_cdeint_forward_matches_torchcde(oracle):
    """Cubic-spline rk4 cdeint forward bit-matches the reference stack
    (torchcde solver.py:223-229 -> torchdiffeq fixed-grid rk4)."""
    x, p, z0, g = _cde_problem()
    zs_ref, _, _ = _ref_cde_grads(oracle, x, p, z0, g, adjoint=False)
    zs_ours, _, _ = _our_cde_grads(x, p, z0, g, adjoint=False)
    np.testing.assert_allclose(zs_ours, zs_ref, rtol=0, atol=1e-13)


def test_cdeint_direct_grads_match_reference_backprop(oracle):
    """Identical discrete forward => identical discrete gradients:
    jax.grad through our piece scan == torch autograd through the
    reference's rk4 loop, to round-off."""
    x, p, z0, g = _cde_problem()
    _, gz0_ref, gp_ref = _ref_cde_grads(oracle, x, p, z0, g, adjoint=False)
    _, gz0_ours, gp_ours = _our_cde_grads(x, p, z0, g, adjoint=False)
    np.testing.assert_allclose(gz0_ours, gz0_ref, rtol=0, atol=1e-12)
    for k in gp_ref:
        np.testing.assert_allclose(gp_ours[k], gp_ref[k], rtol=0, atol=1e-12)


def test_cdeint_adjoint_grads_match_reference_adjoint(oracle):
    """Our interval adjoint integrates the SAME augmented ODE on the same
    grid as the reference's OdeintAdjointMethod (adjoint.py:65-133), so
    the two continuous-adjoint gradients agree to round-off (they differ
    from the discrete gradient by the usual optimise-then-discretise
    error, which both sides share)."""
    x, p, z0, g = _cde_problem()
    _, gz0_ref, gp_ref = _ref_cde_grads(oracle, x, p, z0, g, adjoint=True)
    _, gz0_ours, gp_ours = _our_cde_grads(x, p, z0, g, adjoint=True)
    np.testing.assert_allclose(gz0_ours, gz0_ref, rtol=0, atol=1e-12)
    for k in gp_ref:
        np.testing.assert_allclose(gp_ours[k], gp_ref[k], rtol=0, atol=1e-12)


def test_cdeint_linear_dopri5_matches_at_tolerance(oracle):
    """Linear control + adaptive dopri5: stages land inside pieces (no
    knot-side ambiguity), so the two stacks agree at solver tolerance."""
    torch, torchcde, _ = oracle
    from online_neural_cdes_tpu.ops import interpolation as I
    from online_neural_cdes_tpu.ops.cdeint import cdeint

    x, p, z0, g = _cde_problem(seed=2)
    H, C = _CDE["H"], _CDE["C"]

    class CF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for k, v in p.items():
                setattr(self, k, torch.nn.Parameter(torch.tensor(v)))

        def forward(self, t, z):
            u = torch.relu(z @ self.Wf.T + self.bf)
            return torch.tanh(u @ self.Wo + self.bo).view(-1, H, C)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        Xt = torchcde.LinearInterpolation(
            torchcde.linear_interpolation_coeffs(torch.tensor(x))
        )
    with torch.no_grad():
        zs_ref = torchcde.cdeint(
            Xt, CF(), torch.tensor(z0), Xt.grid_points, adjoint=False,
            method="dopri5", rtol=1e-8, atol=1e-10,
        ).numpy()

    X = I.LinearInterpolation.create(I.linear_interpolation_coeffs(jnp.asarray(x)))

    def field(t, z, pp):
        u = jax.nn.relu(z @ pp["Wf"].T + pp["bf"])
        return jnp.tanh(u @ pp["Wo"] + pp["bo"]).reshape(z.shape[:-1] + (H, C))

    zs_ours = cdeint(
        X, field, jnp.asarray(z0), X.grid_points,
        {k: jnp.asarray(v) for k, v in p.items()},
        adjoint=False, method="dopri5", rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(zs_ours), zs_ref, rtol=0, atol=1e-5)


# ---------------------------------------------------------------------------
# Log-ODE windows vs a closed-form depth-2 oracle (log_ode.py:15-77)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("L", [17, 18])  # divisible and partial last window
def test_logsig_windows_depth2_closed_form(L):
    """For a piecewise-linear path each segment's depth-2 log-signature is
    its increment; composition is exact BCH: a (+) b = a + b + [a,b]/2.
    Folding that in numpy gives a closed-form oracle for the window
    values; the first row / cumsum structure mirrors reference
    log_ode.py:55-72 (first_increment = x0, then cumulative sums)."""
    from online_neural_cdes_tpu.ops.logsig import (
        logsig_windows, logsignature_channels,
    )

    C, depth, win = 3, 2, 4
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(2, L, C))
    ours = np.asarray(logsig_windows(jnp.asarray(xs), depth, win))

    n_ch = logsignature_channels(C, depth)
    n_win = int(np.ceil((L - 1) / win))
    assert ours.shape == (2, n_win + 1, n_ch)

    def bch_window(seg):
        lvl1 = np.zeros(C)
        lvl2 = np.zeros((C, C))
        for d in seg:
            lvl2 = lvl2 + 0.5 * (np.outer(lvl1, d) - np.outer(d, lvl1))
            lvl1 = lvl1 + d
        return lvl1, lvl2

    expected = []
    for b in range(2):
        first = np.zeros(n_ch)
        first[:C] = xs[b, 0]
        rows = [first]
        for w in range(n_win):
            lo, hi = w * win, min(w * win + win, L - 1)
            l1, l2 = bch_window(np.diff(xs[b, lo:hi + 1], axis=0))
            # Lyndon-word order at depth 2, C=3: pairs (i, j), i < j.
            rows.append(np.concatenate([l1, [l2[0, 1], l2[0, 2], l2[1, 2]]]))
        expected.append(np.cumsum(np.stack(rows), axis=0))
    np.testing.assert_allclose(ours, np.stack(expected), rtol=0, atol=1e-12)


def test_smooth_linear_interpolation_matches_reference(oracle):
    """SmoothLinearInterpolation (cubic AND quintic matching regions) vs
    the reference class itself (reference src/ncde/interpolation.py:6-143),
    evaluate + derivative on a dense grid crossing the matching regions."""
    torch, torchcde, _ = oracle
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_smooth_interp", "/root/reference/src/ncde/interpolation.py"
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from online_neural_cdes_tpu.ops.interpolation import (
        SmoothLinearInterpolation, linear_interpolation_coeffs,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 7, 3))
    x[0, 2, 1] = np.nan  # forward-filled by both builders

    coeffs_j = linear_interpolation_coeffs(jnp.asarray(x))
    coeffs_t = torchcde.linear_interpolation_coeffs(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(coeffs_j),
                               coeffs_t.numpy(), rtol=1e-12, atol=1e-12)

    ts = np.linspace(0.0, 6.0, 97)  # crosses every eps-region boundary
    for eps, quintic in ((0.5, False), (0.5, True), (0.2, False)):
        ours = SmoothLinearInterpolation.create(
            coeffs_j, gradient_matching_eps=eps,
            match_second_derivatives=quintic,
        )
        ref = ref_mod.SmoothLinearInterpolation(
            coeffs_t, gradient_matching_eps=eps,
            match_second_derivatives=quintic,
        )
        for t in ts:
            np.testing.assert_allclose(
                np.asarray(ours.evaluate(t)),
                ref.evaluate(torch.tensor(float(t))).numpy(),
                rtol=1e-9, atol=1e-10,
                err_msg=f"evaluate t={t} eps={eps} quintic={quintic}",
            )
            np.testing.assert_allclose(
                np.asarray(ours.derivative(t)),
                ref.derivative(torch.tensor(float(t))).numpy(),
                rtol=1e-9, atol=1e-9,
                err_msg=f"derivative t={t} eps={eps} quintic={quintic}",
            )


def test_sparsemax_matches_reference(oracle):
    """sparsemax forward AND Jacobian-vector products vs the reference's
    vendored implementation (reference src/ncde/sparsemax.py:16-73)."""
    torch, _, _ = oracle
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sparsemax", "/root/reference/src/ncde/sparsemax.py"
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from online_neural_cdes_tpu.models.attention import sparsemax

    rng = np.random.default_rng(5)
    z = rng.normal(size=(4, 9)) * 2.0
    z[0, :3] = z[0, 3]  # ties on the support boundary
    ref_fn = ref_mod.Sparsemax(dim=-1)

    zt = torch.tensor(z, requires_grad=True)
    out_ref = ref_fn(zt)
    out_j = sparsemax(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out_j), out_ref.detach().numpy(),
                               rtol=1e-10, atol=1e-12)
    # Sparse outputs really are sparse and sum to 1.
    assert (np.asarray(out_j) == 0).any()
    np.testing.assert_allclose(np.asarray(out_j).sum(-1), 1.0, rtol=1e-12)

    # VJP against a fixed cotangent.
    g = rng.normal(size=out_ref.shape)
    out_ref.backward(torch.tensor(g))
    _, vjp = jax.vjp(lambda a: sparsemax(a), jnp.asarray(z))
    (gz,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(gz), zt.grad.numpy(),
                               rtol=1e-9, atol=1e-10)


def test_grud_cell_matches_reference(oracle):
    """GRU-D hidden-state dynamics vs the reference cell itself (reference
    src/benchmarks/grud.py:89-140): decay factors, decay-mean imputation,
    and the masked GRU update, weights copied across, multiple steps."""
    torch, _, _ = oracle
    import importlib.util

    # The reference module calls .cuda() at import/construction time (this
    # image's torch is CPU-only) and imports autots — neutralize both.
    _install_autots_stub()
    orig_cuda_t = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_grud", "/root/reference/src/benchmarks/grud.py"
        )
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
        cell = ref_mod.GRUDCell(input_dim=3, hidden_dim=5).double()
    finally:
        torch.Tensor.cuda = orig_cuda_t

    from online_neural_cdes_tpu.models.grud import grud_cell_apply

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    p = {
        "z": {"w": t2j(cell.zl.weight).T, "b": t2j(cell.zl.bias)},
        "r": {"w": t2j(cell.rl.weight).T, "b": t2j(cell.rl.bias)},
        "h": {"w": t2j(cell.hl.weight).T, "b": t2j(cell.hl.bias)},
        # FilterLinear masked by the identity == a diagonal + full bias.
        "gamma_x": {"w": jnp.diagonal(t2j(cell.gamma_x_l.weight)),
                    "b": t2j(cell.gamma_x_l.bias)},
        "gamma_h": {"w": t2j(cell.gamma_h_l.weight).T,
                    "b": t2j(cell.gamma_h_l.bias)},
    }

    rng = np.random.default_rng(7)
    B, C, H = 4, 3, 5
    x_mean = rng.normal(size=(C,))
    h_j = jnp.zeros((B, H), jnp.float64)
    h_t = torch.zeros((B, H), dtype=torch.float64)
    for step in range(5):
        x = rng.normal(size=(B, C))
        x_last = rng.normal(size=(B, C))
        mask = (rng.random(size=(B, C)) > 0.4).astype(np.float64)
        delta = rng.random(size=(B, C)) * 3.0
        h_j = grud_cell_apply(
            p, jnp.asarray(x), jnp.asarray(x_last), jnp.asarray(x_mean),
            h_j, jnp.asarray(mask), jnp.asarray(delta),
        )
        with torch.no_grad():
            h_t = cell(
                torch.tensor(x), torch.tensor(x_last),
                torch.tensor(np.broadcast_to(x_mean, (B, C)).copy()),
                h_t, torch.tensor(mask), torch.tensor(delta),
            )
        np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(),
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"step {step}")


def test_odernn_forward_matches_reference(oracle):
    """End-to-end ODE-RNN vs the reference model itself (reference
    src/benchmarks/odernn.py:7-111) with copied weights — including the
    dts[i-1] first-step quirk our replicate_dt_quirk flag reproduces."""
    torch, _, _ = oracle
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_odernn", "/root/reference/src/benchmarks/odernn.py"
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from online_neural_cdes_tpu.models.odernn import ODERNN

    B, L, C, H, HH, OUT = 3, 6, 4, 5, 7, 2
    # f32 throughout: the reference forward materialises f32 tensors
    # internally (torch.Tensor([0, t])), so f64 weights would dtype-clash.
    ref = ref_mod.ODERNN(
        input_dim=C, hidden_dim=H, output_dim=OUT, hidden_hidden_dim=HH,
        solver="rk4", gru=True, return_sequences=True,
    )

    ours = ODERNN(input_dim=C, hidden_dim=H, output_dim=OUT,
                  hidden_hidden_dim=HH, solver="rk4", gru=True,
                  return_sequences=True, replicate_dt_quirk=True)
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    seq = list(ref.ode_cell.net)  # Linear, Tanh, Linear
    p["ode_net"][0] = {"w": t2j(seq[0].weight).T, "b": t2j(seq[0].bias)}
    p["ode_out"] = {"w": t2j(seq[2].weight).T, "b": t2j(seq[2].bias)}
    p["cell"] = {
        "ih": {"w": t2j(ref.cell.weight_ih).T, "b": t2j(ref.cell.bias_ih)},
        "hh": {"w": t2j(ref.cell.weight_hh).T, "b": t2j(ref.cell.bias_hh)},
    }
    p["final"] = {"w": t2j(ref.final_linear.weight).T,
                  "b": t2j(ref.final_linear.bias)}

    rng = np.random.default_rng(11)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x))
    out_j = ours.apply(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("vector_field", ["original", "minimal", "gru"])
def test_neural_cde_forward_matches_reference(oracle, vector_field):
    """THE headline model end-to-end vs the reference NeuralCDE itself
    (reference src/ncde/ncde.py + vector_fields/base.py + gating.py) with
    copied weights, for all three gating variants: natural-cubic control
    (C^1, so the knot-side divergence is moot), matmul contraction, rk4
    step_size=1, h0 from the initial observation, per-step outputs."""
    torch, _, _ = oracle
    # src.ncde.__init__ pulls attention.py, which imports autots — stub it.
    _install_autots_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.ncde import NeuralCDE as RefNCDE

    from online_neural_cdes_tpu.models.ncde import NeuralCDE

    B, L, C, H, HH, OUT, NL = 2, 8, 3, 6, 8, 2, 2
    ref = RefNCDE(
        input_dim=C, hidden_dim=H, output_dim=OUT, hidden_hidden_dim=HH,
        num_layers=NL, interpolation="cubic", vector_field=vector_field,
        vector_field_type="matmul", adjoint=False, solver="rk4",
        return_sequences=True,
    ).double()

    ours = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=OUT, hidden_hidden_dim=HH,
        num_layers=NL, interpolation="cubic", vector_field=vector_field,
        vector_field_type="matmul", adjoint=False, solver="rk4",
        return_sequences=True, fused=False,
    )
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    # trunk: Sequential(Linear, ReLU, [Linear, ReLU]*): linears at 0,2,4...
    linears = [m for m in ref.func.net_to_hh if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(p["field"]["trunk"])
    p["field"]["trunk"] = [
        {"w": t2j(m.weight).T, "b": t2j(m.bias)} for m in linears
    ]
    def lin(seq_module):
        return {"w": t2j(seq_module[0].weight).T, "b": t2j(seq_module[0].bias)}

    if vector_field == "original":
        p["field"]["out"] = lin(ref.func.tanh_output_layer)
    elif vector_field == "minimal":
        p["field"]["sig"] = lin(ref.func.sigmoid_net)
        p["field"]["tanh"] = lin(ref.func.tanh_net)
    else:  # gru
        p["field"]["reset"] = lin(ref.func.reset_net)
        p["field"]["sig"] = lin(ref.func.sigmoid_net)
        p["field"]["tanh"] = lin(ref.func.tanh_net)
    p["initial"] = {"w": t2j(ref.initial_linear.weight).T,
                    "b": t2j(ref.initial_linear.bias)}
    p["final"] = {"w": t2j(ref.final_linear.weight).T,
                  "b": t2j(ref.final_linear.bias)}

    rng = np.random.default_rng(13)
    x = rng.normal(size=(B, L, C))
    x[0, 3, 1] = np.nan  # imputation path exercised in both builders

    from online_neural_cdes_tpu.ops.interpolation import natural_cubic_coeffs
    import torchcde

    coeffs_j = natural_cubic_coeffs(jnp.asarray(x))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        coeffs_t = torchcde.natural_cubic_coeffs(torch.tensor(x))

    with torch.no_grad():
        out_ref = ref(coeffs_t)
    out_j = ours.apply(p, coeffs_j)
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=1e-9, atol=1e-10)


def _copy_original_field_ncde_params(torch, p, ref):
    """Copy an 'original'-field reference NeuralCDE's weights into our
    param dict (trunk linears, tanh output head, initial/final linears)."""

    def t2j(t):
        # Owned copy, NOT a view: jnp.asarray of a contiguous numpy view is
        # zero-copy on the CPU backend, which would alias the torch tensor's
        # memory — any later in-place torch mutation (opt.step() in the
        # trainer-dynamics oracle) would silently rewrite "our" params.
        return jnp.asarray(np.array(t.detach().numpy()))

    linears = [m for m in ref.func.net_to_hh if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(p["field"]["trunk"])
    p["field"]["trunk"] = [
        {"w": t2j(m.weight).T, "b": t2j(m.bias)} for m in linears
    ]
    p["field"]["out"] = {"w": t2j(ref.func.tanh_output_layer[0].weight).T,
                         "b": t2j(ref.func.tanh_output_layer[0].bias)}
    p["initial"] = {"w": t2j(ref.initial_linear.weight).T,
                    "b": t2j(ref.initial_linear.bias)}
    if "final" in p and hasattr(ref.final_linear, "weight"):
        p["final"] = {"w": t2j(ref.final_linear.weight).T,
                      "b": t2j(ref.final_linear.bias)}
    return p


@pytest.mark.parametrize("interpolation", ["linear", "rectilinear"])
def test_neural_cde_flagship_linear_matches_reference(oracle, interpolation):
    """The PAPER's flagship online configuration end-to-end — linear /
    rectilinear control, rk4 step_size=1 — vs the reference model itself
    with copied weights.

    At a knot time the reference's bucketize-based lookup reads the piece
    ENDING there; torchdiffeq's ``perturb`` option is the reference stack's
    own fix (fixed_grid.py:10-28, rk_common.py:106-114: k1 at Perturb.NEXT,
    k4 at Perturb.PREV) and makes its stage lookups EXACTLY our
    piece-pinned-scan semantics.  So: reference-with-perturb == ours to
    round-off, and reference-without-perturb differs materially — pinning
    that the ONLY linear-control divergence is the documented knot-side
    artifact (module docstring, divergence (a))."""
    torch, torchcde, _ = oracle
    _install_autots_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.ncde import NeuralCDE as RefNCDE

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )

    B, L, C, H, HH, OUT, NL = 2, 8, 3, 6, 8, 2, 2
    ref = RefNCDE(
        input_dim=C, hidden_dim=H, output_dim=OUT, hidden_hidden_dim=HH,
        num_layers=NL, interpolation=interpolation, vector_field="original",
        vector_field_type="matmul", adjoint=False, solver="rk4",
        return_sequences=True,
    ).double()
    ref.cdeint_options = {"step_size": 1, "perturb": True}

    ours = NeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=OUT, hidden_hidden_dim=HH,
        num_layers=NL, interpolation=interpolation, vector_field="original",
        vector_field_type="matmul", adjoint=False, solver="rk4",
        return_sequences=True, fused=False,
    )
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    _copy_original_field_ncde_params(torch, p, ref)

    rng = np.random.default_rng(13)
    x = rng.normal(size=(B, L, C))
    x[:, :, 0] = np.linspace(0.0, 1.0, L)  # time channel (rectilinear)
    x[0, 3, 1] = np.nan
    rect = {"rectilinear": 0} if interpolation == "rectilinear" else {}
    coeffs_j = linear_interpolation_coeffs(jnp.asarray(x), **rect)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        coeffs_t = torchcde.linear_interpolation_coeffs(torch.tensor(x), **rect)
    np.testing.assert_allclose(np.asarray(coeffs_j), coeffs_t.numpy())

    with torch.no_grad():
        out_ref = ref(coeffs_t)
    out_j = ours.apply(p, coeffs_j)
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=1e-12, atol=1e-13)

    # Without perturb the reference reads the PREVIOUS piece's slope at the
    # first stage of every interval — the documented divergence is material,
    # not round-off.
    ref.cdeint_options = {"step_size": 1}
    with torch.no_grad():
        out_ref_quirk = ref(coeffs_t)
    assert np.max(np.abs(np.asarray(out_j) - out_ref_quirk.numpy())) > 1e-3


@pytest.mark.parametrize("static_dim,static_in_all_layers",
                         [(None, False), (2, True)])
def test_stacked_ncde_matches_reference(oracle, static_dim,
                                        static_in_all_layers):
    """StackedNeuralCDE end-to-end vs the reference model itself (reference
    src/ncde/stacked.py:7-131) with copied weights: the hidden path of each
    layer feeds the next as its own linear-interpolation coefficients,
    statics optionally to every layer, final linear only on the last.
    Inner solves run with the reference's ``perturb`` fix (see the flagship
    linear oracle above).  Note the reference's ``_create_ncde`` does NOT
    forward ``hidden_hidden_dim`` (inner layers always use the default 15)
    — weight copy overrides both sides identically, so this quirk does not
    bite here."""
    torch, torchcde, _ = oracle
    _install_autots_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.ncde.stacked import StackedNeuralCDE as RefStacked

    from online_neural_cdes_tpu.models.stacked import StackedNeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    B, L, C, OUT, HH = 2, 7, 3, 2, 6
    HD = (5, 4)
    ref = RefStacked(
        input_dim=C, hidden_dims=list(HD), output_dim=OUT,
        hidden_hidden_dim=HH, static_dim=static_dim, adjoint=False,
        return_sequences=True, static_in_all_layers=static_in_all_layers,
    ).double()
    for n in ref.ncdes:
        n.cdeint_options = {"step_size": 1, "perturb": True}

    ours = StackedNeuralCDE(
        input_dim=C, hidden_dims=HD, output_dim=OUT, hidden_hidden_dim=HH,
        static_dim=static_dim, adjoint=False, return_sequences=True,
        static_in_all_layers=static_in_all_layers,
    )
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    for i, rn in enumerate(ref.ncdes):
        _copy_original_field_ncde_params(torch, p[f"ncde_{i}"], rn)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, L, C))
    cj = linear_interpolation_coeffs(jnp.asarray(x))
    ct = torchcde.linear_interpolation_coeffs(torch.tensor(x))
    if static_dim:
        s = rng.normal(size=(B, static_dim))
        inp_t, inp_j = [torch.tensor(s), ct], (jnp.asarray(s), cj)
    else:
        inp_t, inp_j = ct, cj

    with torch.no_grad():
        out_ref = ref(inp_t)
    out_j = ours.apply(p, inp_j)
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=1e-12, atol=1e-13)


class _ForwardFillStub:
    """Functional stand-in for autots.preprocessing.ForwardFill (absent in
    this image): forward-fill NaNs along the time dim, leading NaNs kept —
    the semantics the reference's prepare relies on (grud.py:247-250)."""

    def transform(self, x):
        out = x.clone()
        for i in range(1, out.shape[1]):
            nanm = __import__("torch").isnan(out[:, i])
            out[:, i][nanm] = out[:, i - 1][nanm]
        return out


def _load_ref_grud(torch):
    """Import the reference grud module with a FUNCTIONAL ForwardFill and
    .cuda() neutralised (CPU-only torch in this image)."""
    import importlib.util

    _install_autots_stub()
    sys.modules["autots.preprocessing"].ForwardFill = _ForwardFillStub
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_grud_full", "/root/reference/src/benchmarks/grud.py"
        )
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
    finally:
        torch.Tensor.cuda = orig_cuda
    return ref_mod


def _ragged_nan_series(rng, B=3, L=9, C=4):
    """Monotone time channel, random value NaNs, one series with a NaN
    ragged tail — the GRU-variant preparation's hard cases."""
    x = rng.normal(size=(B, L, C))
    times = np.cumsum(np.abs(rng.normal(size=(B, L))) + 0.1, axis=1)
    x[rng.random(size=(B, L, C)) < 0.3] = np.nan
    x[..., 0] = times          # the time channel is always observed...
    x[1, -2:, :] = np.nan      # ...except past the final time (ragged end)
    return x


@pytest.mark.parametrize(
    "variant", ["gru", "gru-intensity", "gru-dt", "gru-dt-intensity", "gru-d"]
)
def test_prepare_gru_variant_data_matches_reference(oracle, variant):
    """GRU-variant data preparation vs the reference's own prepare
    (grud.py:186-281): the delta/mask recursion, forward fill +
    feature-mean imputation, past-final-time zeroing, and each variant's
    channel subset/concat — EXACT equality including the NaN pattern."""
    torch, _, _ = oracle
    ref_mod = _load_ref_grud(torch)
    from online_neural_cdes_tpu.models.grud import prepare_gru_variant_data

    rng = np.random.default_rng(5)
    x = _ragged_nan_series(rng)
    fm = rng.normal(size=(x.shape[-1],))
    fm[2] = np.nan  # a channel with no training-set mean

    ref_out = ref_mod.prepare_gru_variant_data(
        torch.tensor(x), variant, feature_means=torch.tensor(fm)
    ).numpy()
    ours = np.asarray(
        prepare_gru_variant_data(jnp.asarray(x), variant,
                                 feature_means=jnp.asarray(fm))
    )
    assert ref_out.shape == ours.shape
    np.testing.assert_array_equal(np.isnan(ref_out), np.isnan(ours))
    np.testing.assert_allclose(
        np.nan_to_num(ours), np.nan_to_num(ref_out), rtol=0, atol=0
    )


@pytest.mark.parametrize("return_sequences", [True, False])
def test_grud_model_matches_reference(oracle, return_sequences):
    """The FULL GRU-D model end-to-end vs the reference GRUD class itself
    (grud.py:16-86) with copied weights, fed the reference's own prepared
    [N, 4, L, C] tensor — covers the NaN->0 feature-mean handling, the
    scanned cell recursion, and both output heads."""
    torch, _, _ = oracle
    ref_mod = _load_ref_grud(torch)
    from online_neural_cdes_tpu.models.grud import GRUD

    rng = np.random.default_rng(5)
    x = _ragged_nan_series(rng)
    C = x.shape[-1]
    fm = rng.normal(size=(C,))
    fm[2] = np.nan

    inp = ref_mod.prepare_gru_variant_data(
        torch.tensor(x), "gru-d", feature_means=torch.tensor(fm)
    )

    H, OUT = 6, 2
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref = ref_mod.GRUD(
            feature_means=torch.tensor(fm.copy()), input_dim=C, hidden_dim=H,
            output_dim=OUT, return_sequences=return_sequences,
        ).double()
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = GRUD(input_dim=C, hidden_dim=H, output_dim=OUT,
                return_sequences=return_sequences)
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    cell = ref.cell
    p["cell"] = {
        "z": {"w": t2j(cell.zl.weight).T, "b": t2j(cell.zl.bias)},
        "r": {"w": t2j(cell.rl.weight).T, "b": t2j(cell.rl.bias)},
        "h": {"w": t2j(cell.hl.weight).T, "b": t2j(cell.hl.bias)},
        "gamma_x": {"w": jnp.diagonal(t2j(cell.gamma_x_l.weight)),
                    "b": t2j(cell.gamma_x_l.bias)},
        "gamma_h": {"w": t2j(cell.gamma_h_l.weight).T,
                    "b": t2j(cell.gamma_h_l.bias)},
    }
    p["final"] = {"w": t2j(ref.final_linear.weight).T,
                  "b": t2j(ref.final_linear.bias)}

    with torch.no_grad():
        out_ref = ref(inp)
    out_j = ours.apply(p, jnp.asarray(inp.numpy()), jnp.asarray(fm))
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=1e-13, atol=1e-14)


# ---------------------------------------------------------------------------
# AttentionNeuralCDE end-to-end vs the reference model itself
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_sparsemax", [False, True])
def test_attention_ncde_matches_reference(oracle, use_sparsemax):
    """End-to-end AttentionNeuralCDE vs the reference model itself
    (reference src/ncde/attention.py:10-141) with copied weights, for both
    activations (softmax / sparsemax).

    This pins the module docstring's equivalence claim about the ONE
    TPU-native restructuring in models/attention.py: the reference gathers
    the kept states into RAGGED per-sample tensors, pads to the batch max
    and forward-fills (attention.py:100-118, via autots transforms —
    functionally stubbed above); we compact kept states to the front of
    the fixed length-L axis and fill the tail with the last kept state.
    Both give the final NCDE a path whose tail is CONSTANT (dX = 0), so
    every RK stage there evaluates to zero and the terminal hidden state
    is identical — asserted here to round-off at f64.

    The internal NCDEs are linear-control rk4, so the reference sides run
    with perturb=True (its own fix for the knot-side lookup, divergence
    (a) above) exactly as in the flagship linear oracle."""
    torch, torchcde, _ = oracle
    _install_autots_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.ncde.attention import AttentionNeuralCDE as RefAttention

    from online_neural_cdes_tpu.models.attention import AttentionNeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import (
        linear_interpolation_coeffs,
    )

    B, L, C, H, OUT = 3, 8, 4, 5, 2
    ref = RefAttention(
        input_dim=C, hidden_dim=H, output_dim=OUT, adjoint=False,
        run_backwards=True, sparsemax=use_sparsemax,
    ).double()
    for ncde in (ref.encoder, ref.attention[1], ref.final[0]):
        ncde.cdeint_options = {"step_size": 1, "perturb": True}

    ours = AttentionNeuralCDE(
        input_dim=C, hidden_dim=H, output_dim=OUT, adjoint=False,
        run_backwards=True, sparsemax=use_sparsemax,
    )
    p = ours.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    _copy_original_field_ncde_params(torch, p["encoder"], ref.encoder)
    _copy_original_field_ncde_params(torch, p["attention"], ref.attention[1])
    _copy_original_field_ncde_params(torch, p["final"], ref.final[0])

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy()))

    p["fc_output"] = {"w": t2j(ref.fc_output.weight).T,
                      "b": t2j(ref.fc_output.bias)}

    rng = np.random.default_rng(29)
    x = rng.normal(size=(B, L, C))
    x[0, 3, 1] = np.nan  # imputation path in both coefficient builders
    coeffs_j = linear_interpolation_coeffs(jnp.asarray(x))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        coeffs_t = torchcde.linear_interpolation_coeffs(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(coeffs_j), coeffs_t.numpy())

    # The test is only meaningful if the keep-mask actually DROPS states
    # (exercising compaction vs ragged-gather) while keeping >=1 per
    # sample (the reference's empty-gather would crash).  Recompute the
    # reference's keep_bools (attention.py:103) and assert both.
    with torch.no_grad():
        hidden_t = ref.encoder(coeffs_t)
        weights_t = ref.attention(hidden_t)
        keep = (weights_t > 1.0 / hidden_t.shape[1])[..., 0]
    counts = keep.sum(dim=1)
    assert counts.min().item() >= 1
    assert counts.max().item() < L

    with torch.no_grad():
        out_ref = ref(coeffs_t)
    out_j = ours.apply(p, coeffs_j)
    np.testing.assert_allclose(np.asarray(out_j), out_ref.numpy(),
                               rtol=1e-9, atol=1e-10)
