"""Fused vector-field kernel tests: the fused op must be numerically
identical to the unfused trunk->head->einsum composition, in both values
and gradients, and the Pallas kernel (interpreter mode on CPU) must match
the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.models.vector_fields import VectorField
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.ops.kernels import (
    _forward_pallas,
    _forward_reference,
    fused_matmul_field,
    pack_fused_params,
)

B, L, C, H, HH = 8, 6, 3, 8, 16


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    field = VectorField(input_dim=C, hidden_dim=H, hidden_hidden_dim=HH,
                        num_layers=2, kind="original")
    params = field.init(jax.random.PRNGKey(seed))
    z = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    return field, params, z, dx


@pytest.mark.smoke
def test_fused_matches_unfused_field():
    field, params, z, dx = _setup()
    expected = jnp.einsum("bhi,bi->bh", field.apply(params, 0.0, z), dx)
    packed = pack_fused_params(params, H, C)
    got = fused_matmul_field(
        packed["trunk"], packed["head_w"], packed["head_b"], z, dx, H, C, False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_fused_gradients_match_unfused():
    field, params, z, dx = _setup(1)

    def loss_fused(p, z_, dx_):
        packed = pack_fused_params(p, H, C)
        out = fused_matmul_field(
            packed["trunk"], packed["head_w"], packed["head_b"], z_, dx_, H, C, False
        )
        return jnp.sum(out ** 2)

    def loss_ref(p, z_, dx_):
        out = jnp.einsum("bhi,bi->bh", field.apply(p, 0.0, z_), dx_)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, z, dx)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, z, dx)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        gf, gr,
    )


def test_pallas_kernel_interpret_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    field, params, z, dx = _setup(2)
    packed = pack_fused_params(params, H, C)
    ref = _forward_reference(
        packed["trunk"], packed["head_w"], packed["head_b"], z, dx, H, C
    )
    with pltpu.force_tpu_interpret_mode():
        got = _forward_pallas(
            packed["trunk"], packed["head_w"], packed["head_b"], z, dx, H, C
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_rk4_interval_matches_composition():
    from jax.experimental.pallas import tpu as pltpu

    from online_neural_cdes_tpu.ops.kernels import fused_rk4_interval
    from online_neural_cdes_tpu.ops.solvers import tree_fixed_step

    field, params, z, dx = _setup(4)
    packed = pack_fused_params(params, H, C, pad=False)
    step = tree_fixed_step("rk4")
    expected = step(
        lambda t, zz: _forward_reference(
            packed["trunk"], packed["head_w"], packed["head_b"], zz, dx, H, C
        ),
        0.0, 1.0, z,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fused_rk4_interval(
            packed["trunk"], packed["head_w"], packed["head_b"], z, dx, H, C
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_fused_rk4_interval_multi_matches_per_replica():
    """The K-replica interleaved interval kernel must equal K independent
    single-replica intervals exactly (it only restructures scheduling)."""
    from jax.experimental.pallas import tpu as pltpu

    from online_neural_cdes_tpu.ops.kernels import (
        fused_rk4_interval, fused_rk4_interval_multi,
    )

    K = 3
    packs, zs, dxs = [], [], []
    for r in range(K):
        _, params, z, dx = _setup(10 + r)
        packs.append(pack_fused_params(params, H, C, pad=False))
        zs.append(z)
        dxs.append(dx)

    with pltpu.force_tpu_interpret_mode():
        expected = [
            fused_rk4_interval(p["trunk"], p["head_w"], p["head_b"],
                               z, dx, H, C)
            for p, z, dx in zip(packs, zs, dxs)
        ]
        trunk = [
            {"w": jnp.stack([p["trunk"][i]["w"] for p in packs]),
             "b": jnp.stack([p["trunk"][i]["b"] for p in packs])}
            for i in range(len(packs[0]["trunk"]))
        ]
        got = fused_rk4_interval_multi(
            trunk,
            jnp.stack([p["head_w"] for p in packs]),
            jnp.stack([p["head_b"] for p in packs]),
            jnp.stack(zs), jnp.stack(dxs), H, C,
        )
    for r in range(K):
        np.testing.assert_allclose(np.asarray(got[r]),
                                   np.asarray(expected[r]), atol=1e-5)


@pytest.mark.parametrize("adjoint", [False, True])
def test_rectilinear_paired_scan_equivalence(adjoint):
    """The paired rectilinear scan (cheap time-column field on even
    intervals) must match the plain fused solve exactly: even intervals'
    value deltas are 0 by construction, so skipping them changes nothing
    but the FLOPs.  Checked for values and parameter/coefficient grads."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    x = x.at[:, :, 0].set(jnp.arange(L, dtype=jnp.float32))
    from online_neural_cdes_tpu.ops import cdeint as cdeint_mod

    coeffs = linear_interpolation_coeffs(x, rectilinear=0)
    kw = dict(input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=HH,
              num_layers=2, adjoint=adjoint, solver="rk4",
              return_sequences=True, interpolation="rectilinear")
    m_pair = NeuralCDE(fused=True, **kw)
    m_plain = NeuralCDE(fused=False, **kw)
    params = m_pair.init(jax.random.PRNGKey(1))

    # The fused model must actually route through the paired scan
    # machinery (not silently fall back to the plain piece scan, which
    # would make this equivalence test vacuous).
    paired_calls = {"n": 0}
    orig_fwd = cdeint_mod._fixed_scan_forward_paired
    orig_adj = cdeint_mod._fixed_cde_adjoint_paired

    def spy_fwd(*a, **k):
        paired_calls["n"] += 1
        return orig_fwd(*a, **k)

    def spy_adj(*a, **k):
        paired_calls["n"] += 1
        return orig_adj(*a, **k)

    cdeint_mod._fixed_scan_forward_paired = spy_fwd
    cdeint_mod._fixed_cde_adjoint_paired = spy_adj
    try:
        out_pair = m_pair.apply(params, coeffs)
    finally:
        cdeint_mod._fixed_scan_forward_paired = orig_fwd
        cdeint_mod._fixed_cde_adjoint_paired = orig_adj
    assert paired_calls["n"] > 0, "fused model did not use the paired scan"

    out_plain = m_plain.apply(params, coeffs)
    np.testing.assert_allclose(np.asarray(out_pair), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)

    # Gradients are compared THROUGH the rectilinear construction: w.r.t.
    # the raw coefficient array the paired scan drops d(out)/d(dx_value)
    # terms on even intervals, but those cancel exactly under the
    # construction (value rows are tied), so source-data and parameter
    # gradients are exact.
    def loss(model):
        def f(p, x_):
            c = linear_interpolation_coeffs(x_, rectilinear=0)
            return jnp.sum(model.apply(p, c) ** 2)
        return f

    gp, gx = jax.grad(loss(m_pair), argnums=(0, 1))(params, x)
    rp, rx = jax.grad(loss(m_plain), argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        (gp, gx), (rp, rx),
    )


@pytest.mark.parametrize("adjoint", [False, True])
def test_ncde_fused_flag_equivalence(adjoint):
    """NeuralCDE(fused=True) must produce the same forward and gradients as
    fused=False on CPU (where the fused path uses the XLA reference)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    coeffs = linear_interpolation_coeffs(x)
    kw = dict(input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=HH,
              num_layers=2, adjoint=adjoint, solver="rk4", return_sequences=True)
    m_fused = NeuralCDE(fused=True, **kw)
    m_plain = NeuralCDE(fused=False, **kw)
    params = m_fused.init(jax.random.PRNGKey(0))

    out_f = m_fused.apply(params, coeffs)
    out_p = m_plain.apply(params, coeffs)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)

    gf = jax.grad(lambda p: jnp.sum(m_fused.apply(p, coeffs) ** 2))(params)
    gp = jax.grad(lambda p: jnp.sum(m_plain.apply(p, coeffs) ** 2))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        gf, gp,
    )


def test_rectilinear_nonzero_time_channel_paired_scan():
    """The paired scan's cheap even-interval field must contract the
    DECLARED time channel (NeuralCDE.rectilinear_time_channel), not
    channel 0: with time in channel 1, fused and plain models must agree."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32)
    x = x.at[:, :, 1].set(jnp.arange(L, dtype=jnp.float32))
    coeffs = linear_interpolation_coeffs(x, rectilinear=1)
    kw = dict(input_dim=C, hidden_dim=H, output_dim=2, hidden_hidden_dim=HH,
              num_layers=2, adjoint=False, solver="rk4",
              return_sequences=True, interpolation="rectilinear",
              rectilinear_time_channel=1)
    m_pair = NeuralCDE(fused=True, **kw)
    m_plain = NeuralCDE(fused=False, **kw)
    params = m_pair.init(jax.random.PRNGKey(2))
    out_pair = m_pair.apply(params, coeffs)
    out_plain = m_plain.apply(params, coeffs)
    np.testing.assert_allclose(np.asarray(out_pair), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)
    # The outputs must actually depend on the hidden dynamics (sanity that
    # the cheap path did not zero the even intervals).
    assert float(jnp.std(out_pair)) > 1e-4


def test_pallas_backward_interpret_matches_xla_vjp():
    """The one-pass Pallas backward (recompute + all cotangents in VMEM)
    must match the XLA recompute vjp exactly — values checked for every
    input group, padded and unpadded packing."""
    from jax.experimental.pallas import tpu as pltpu

    from online_neural_cdes_tpu.ops.kernels import _backward_pallas

    for pad in (False, True):
        field, params, z, dx = _setup(5)
        packed = pack_fused_params(params, H, C, pad=pad)
        rng = np.random.default_rng(6)
        hp = packed["head_w"].shape[1] // C
        # The op's cotangent has the true hidden width; _fused_bwd
        # zero-pads it to hp before calling the kernel.
        g = jnp.pad(jnp.asarray(rng.normal(size=(B, H)), jnp.float32),
                    ((0, 0), (0, hp - H)))

        def ref(trunk_, head_w_, head_b_, z_, dx_):
            out = _forward_reference(trunk_, head_w_, head_b_, z_, dx_, H, C)
            return jnp.pad(out, ((0, 0), (0, hp - H)))

        _, vjp = jax.vjp(ref, packed["trunk"], packed["head_w"],
                         packed["head_b"], z, dx)
        et, ehw, ehb, ez, edx = vjp(g)
        with pltpu.force_tpu_interpret_mode():
            gt, ghw, ghb, gz, gdx = _backward_pallas(
                packed["trunk"], packed["head_w"], packed["head_b"],
                z, dx, g, H, C, "float32",
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5),
            (gt, ghw, ghb, gz, gdx), (et, ehw, ehb, ez, edx),
        )


def test_fused_field_preserves_float64():
    """Under x64 the fused field must accumulate in f64 — the accumulator
    dtype follows the inputs (``_mm``'s promote_types), so f64 oracle runs
    and x64 debugging are not silently truncated to f32 (~1e-8 error,
    found via the StackedNeuralCDE reference oracle)."""
    field, params, z, dx = _setup(3)
    params64 = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    z64, dx64 = z.astype(jnp.float64), dx.astype(jnp.float64)
    expected = jnp.einsum("bhi,bi->bh", field.apply(params64, 0.0, z64), dx64)
    packed = pack_fused_params(params64, H, C)
    got = fused_matmul_field(
        packed["trunk"], packed["head_w"], packed["head_b"], z64, dx64, H, C,
        False,
    )
    assert got.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-14, atol=1e-14)


def test_fused_field_preserves_bfloat16_and_vjp_dtypes():
    """bf16 *storage* through the fused field: the reference route's output
    dtype must match the Pallas path's declared ``z.dtype`` (out_shape),
    and the custom_vjp fallback must accept same-dtype cotangents.  The
    un-cast f32 accumulator escaped here before: on TPU at lane-aligned
    widths the primal runs Pallas (bf16 out) while the backward's
    ``jax.vjp`` fallback differentiated an f32-out reference — a VJP dtype
    clash that broke trainer.compute_dtype='bfloat16' at H=128 (caught by
    BENCH r4's bf16_storage leg on hardware)."""
    field, params, z, dx = _setup(5)
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    z16, dx16 = z.astype(jnp.bfloat16), dx.astype(jnp.bfloat16)
    packed = pack_fused_params(params16, H, C)

    def f(trunk, head_w, head_b, z_, dx_):
        return fused_matmul_field(trunk, head_w, head_b, z_, dx_, H, C, False)

    out, vjp = jax.vjp(f, packed["trunk"], packed["head_w"],
                       packed["head_b"], z16, dx16)
    assert out.dtype == jnp.bfloat16
    cotangents = vjp(jnp.ones_like(out))  # same-dtype cotangent must be legal
    for leaf in jax.tree.leaves(cotangents):
        assert leaf.dtype == jnp.bfloat16
