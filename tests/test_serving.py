"""Serving predictor tests: ragged requests, batch/length bucketing,
padding-stripped outputs, no-recompile on repeat shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.serving import Predictor


def _predictor(return_sequences):
    model = NeuralCDE(
        input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
        interpolation="linear", return_sequences=return_sequences,
        adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))
    return Predictor(
        model, params, coeff_fn=lambda x: linear_interpolation_coeffs(x),
        batch_buckets=(4, 16), length_multiple=8,
    )


def _requests(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        L = int(rng.integers(4, 20))
        s = rng.normal(size=(L, 3)).astype(np.float32)
        s[:, 0] = np.arange(L)
        out.append(s)
    return out


def test_sequence_outputs_truncated_to_request_length():
    pred = _predictor(return_sequences=True)
    reqs = _requests(3)
    outs = pred.predict(reqs)
    assert len(outs) == 3
    for r, o in zip(reqs, outs):
        assert o.shape == (len(r), 2)
        assert np.isfinite(o).all()


@pytest.mark.smoke
def test_oneshot_outputs_and_batch_padding():
    pred = _predictor(return_sequences=False)
    outs = pred.predict(_requests(5))  # pads batch 5 -> bucket 16
    assert len(outs) == 5
    assert all(o.shape == (2,) for o in outs)


def test_padding_does_not_change_results():
    """A request served alone equals the same request served in a padded
    batch (forward-fill padding has dX=0)."""
    pred = _predictor(return_sequences=False)
    reqs = _requests(4, seed=1)
    solo = pred.predict(reqs[:1])[0]
    batched = pred.predict(reqs)[0]
    np.testing.assert_allclose(solo, batched, rtol=1e-5, atol=1e-6)


def test_rectilinear_rows_maps_to_observation_times():
    """A model emitting unfiltered rectilinear rows (2L-1 per request) is
    served back as one row per observation time, equal to the filtered
    model's output."""
    kw = dict(input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
              interpolation="rectilinear", return_sequences=True,
              adjoint=False, solver="rk4")
    unfiltered = NeuralCDE(return_filtered_rectilinear=False, **kw)
    filtered = NeuralCDE(**kw)
    params = unfiltered.init(jax.random.PRNGKey(0))

    def coeff_fn(x):
        return linear_interpolation_coeffs(x, rectilinear=0)

    pred_u = Predictor(unfiltered, params, coeff_fn=coeff_fn,
                       batch_buckets=(4,), length_multiple=8,
                       rectilinear_rows=True)
    pred_f = Predictor(filtered, params, coeff_fn=coeff_fn,
                       batch_buckets=(4,), length_multiple=8)
    reqs = _requests(3, seed=2)
    outs_u = pred_u.predict(reqs)
    outs_f = pred_f.predict(reqs)
    for r, ou, of in zip(reqs, outs_u, outs_f):
        assert ou.shape == (len(r), 2)
        np.testing.assert_allclose(ou, of, rtol=1e-5, atol=1e-6)


def test_precompile_covers_bucket_grid():
    pred = _predictor(return_sequences=False)
    n = pred.precompile(channels=3, max_length=16)
    assert n == 2 * 2  # batch buckets (4, 16) x lengths (8, 16)


def test_precompile_covers_top_bucket_for_non_multiple_max_length():
    """max_length=20 pads UP to bucket 24 (length_multiple=8), so the warm
    range must include it — otherwise a length-20 request compiles at serve
    time, exactly the latency spike precompile exists to prevent."""
    pred = _predictor(return_sequences=False)
    n = pred.precompile(channels=3, max_length=20)
    assert n == 2 * 3  # batch buckets (4, 16) x lengths (8, 16, 24)


def test_online_stepper_matches_offline_apply():
    """Streaming one-observation-at-a-time inference reproduces the offline
    rectilinear NCDE outputs exactly (each observation = one time-advance
    + one value-update piece), including held (NaN) values mid-stream."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    rng = np.random.default_rng(0)
    B, L, C = 4, 7, 3
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    x[1, 3, 1] = np.nan
    x[2, 5, 2] = np.nan

    model = NeuralCDE(input_dim=C, hidden_dim=8, output_dim=2,
                      hidden_hidden_dim=12, num_layers=1,
                      interpolation="rectilinear", return_sequences=True,
                      adjoint=False, solver="rk4")
    params = model.init(jax.random.PRNGKey(0))
    offline = np.asarray(model.apply(
        params, linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)))

    stepper = OnlineNCDEStepper(model, params)
    state = stepper.init(jnp.asarray(x[:, 0]))
    outs = [np.asarray(stepper.readout(state["z"]))]
    for k in range(1, L):
        state, y = stepper.step(state, jnp.asarray(x[:, k]))
        outs.append(np.asarray(y))
    online = np.stack(outs, axis=1)
    np.testing.assert_allclose(online, offline, rtol=1e-5, atol=1e-6)


def test_online_stepper_rejects_non_rectilinear():
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    model = NeuralCDE(input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
                      interpolation="linear", adjoint=False, solver="rk4")
    with pytest.raises(ValueError, match="rectilinear"):
        OnlineNCDEStepper(model, model.init(jax.random.PRNGKey(0)))


def test_online_stepper_with_static_features():
    """Streaming stepper h0 includes static features (static_dim models)."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    rng = np.random.default_rng(1)
    B, L, C, S = 4, 6, 3, 2
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))

    model = NeuralCDE(input_dim=C, hidden_dim=8, output_dim=2,
                      hidden_hidden_dim=12, num_layers=1, static_dim=S,
                      interpolation="rectilinear", return_sequences=True,
                      adjoint=False, solver="rk4")
    params = model.init(jax.random.PRNGKey(0))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    offline = np.asarray(model.apply(params, (static, coeffs)))

    stepper = OnlineNCDEStepper(model, params, static=static)
    state = stepper.init(jnp.asarray(x[:, 0]))
    outs = [np.asarray(stepper.readout(state["z"]))]
    for k in range(1, L):
        state, y = stepper.step(state, jnp.asarray(x[:, k]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(outs, 1), offline, rtol=1e-5, atol=1e-6)


def test_online_stepper_static_without_use_initial():
    """use_initial=False + static: offline h0 = initial_linear(static)
    (models/ncde.py:188) — the stepper must mirror it, not zero."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    rng = np.random.default_rng(2)
    B, L, C, S = 3, 5, 3, 2
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)
    static = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))

    model = NeuralCDE(input_dim=C, hidden_dim=8, output_dim=2,
                      hidden_hidden_dim=12, num_layers=1, static_dim=S,
                      use_initial=False, interpolation="rectilinear",
                      return_sequences=True, adjoint=False, solver="rk4")
    params = model.init(jax.random.PRNGKey(0))
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    offline = np.asarray(model.apply(params, (static, coeffs)))

    stepper = OnlineNCDEStepper(model, params, static=static)
    state = stepper.init(jnp.asarray(x[:, 0]))
    outs = [np.asarray(stepper.readout(state["z"]))]
    for k in range(1, L):
        state, y = stepper.step(state, jnp.asarray(x[:, k]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(outs, 1), offline, rtol=1e-5, atol=1e-6)


def test_online_stepper_rejects_non_matmul_field():
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    model = NeuralCDE(input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
                      interpolation="rectilinear", vector_field_type="evaluate",
                      adjoint=False, solver="rk4")
    with pytest.raises(ValueError, match="matmul"):
        OnlineNCDEStepper(model, model.init(jax.random.PRNGKey(0)))


def test_oversized_request_chunks_through_largest_bucket():
    """Requests beyond the biggest batch bucket must run as chunks of
    precompiled shapes, not a new never-warmed batch shape."""
    model = NeuralCDE(
        input_dim=3, hidden_dim=6, output_dim=2, num_layers=1,
        interpolation="linear", return_sequences=False,
        adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(
        model, params, coeff_fn=lambda x: linear_interpolation_coeffs(x),
        batch_buckets=(1, 4), length_multiple=8,
    )
    series = _requests(11)
    out = pred.predict(series)
    assert len(out) == 11
    # chunking must not change results vs one-by-one prediction
    singles = [pred.predict([s])[0] for s in series]
    for a, b in zip(out, singles):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_predictor_serves_logsig_models():
    """Log-ODE models serve through the standard Predictor: the coeff_fn
    hook applies the window transform to the bucket-padded batch (pad rows
    forward-fill to zero increments = Chen identity, so padding cannot
    change any request's prediction) — ragged requests match per-request
    direct computation."""
    import jax

    from online_neural_cdes_tpu.models.ncde import NeuralCDE
    from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
    from online_neural_cdes_tpu.ops.logsig import logsig_windows, logsignature_channels
    from online_neural_cdes_tpu.serving import Predictor

    depth, window = 2, 4
    C = 3
    n_ch = logsignature_channels(C, depth)
    model = NeuralCDE(input_dim=n_ch, hidden_dim=6, output_dim=2,
                      hidden_hidden_dim=8, num_layers=1,
                      interpolation="linear", adjoint=False,
                      return_sequences=False)
    params = model.init(jax.random.PRNGKey(0))

    def coeff_fn(x):
        return linear_interpolation_coeffs(logsig_windows(x, depth, window))

    pred = Predictor(model, params, coeff_fn=coeff_fn,
                     batch_buckets=(1, 4), length_multiple=8)

    rng = np.random.default_rng(0)
    series = [rng.normal(size=(L, C)).astype(np.float32) * 0.3
              for L in (13, 21, 9)]
    outs = pred.predict(series)
    assert len(outs) == 3
    for s, out in zip(series, outs):
        direct = model.apply(
            params, linear_interpolation_coeffs(
                logsig_windows(jnp.asarray(s)[None], depth, window)))
        # Bucket padding appends zero-increment windows; the terminal
        # logsig row (cumsum) is constant through them, so predictions
        # agree to float tolerance.
        np.testing.assert_allclose(np.asarray(out).ravel(),
                                   np.asarray(direct).ravel(),
                                   rtol=1e-4, atol=1e-5)


def test_predict_many_bit_identical_to_per_batch_predict():
    """Throughput mode (bounded in-flight pipelining) must return exactly
    what latency-mode predict returns per batch — including an oversized
    batch that chunks through the top bucket, sequence outputs, and an
    in_flight window smaller than the unit count (so the drain path
    interleaves with dispatch)."""
    pred = _predictor(return_sequences=True)
    batches = [
        _requests(3, seed=2),
        _requests(20, seed=3),   # > top bucket (16): chunks into 16 + 4
        _requests(1, seed=4),
        _requests(5, seed=5),
    ]
    many = pred.predict_many(batches, in_flight=2)
    assert [len(m) for m in many] == [len(b) for b in batches]
    for batch, outs in zip(batches, many):
        expected = pred.predict(batch)
        for o, e in zip(outs, expected):
            np.testing.assert_array_equal(o, e)


def test_predict_many_with_statics_and_validation():
    model = NeuralCDE(
        input_dim=3, hidden_dim=6, output_dim=2, num_layers=1, static_dim=2,
        interpolation="linear", return_sequences=False,
        adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(1))
    pred = Predictor(
        model, params, coeff_fn=lambda x: linear_interpolation_coeffs(x),
        batch_buckets=(4,), length_multiple=8,
    )
    rng = np.random.default_rng(6)
    batches = [_requests(3, seed=7), _requests(6, seed=8)]
    statics = [rng.normal(size=(len(b), 2)).astype(np.float32)
               for b in batches]
    many = pred.predict_many(batches, statics=statics, in_flight=1)
    for batch, static, outs in zip(batches, statics, many):
        expected = pred.predict(batch, static=static)
        for o, e in zip(outs, expected):
            np.testing.assert_array_equal(o, e)
    with pytest.raises(ValueError):
        pred.predict_many(batches, statics=statics[:1])


def test_empty_request_batch_raises_in_both_modes():
    pred = _predictor(return_sequences=False)
    with pytest.raises(ValueError, match="empty"):
        pred.predict([])
    with pytest.raises(ValueError, match="empty"):
        pred.predict_many([_requests(2), []])


def test_predictor_from_bundle_serves_recurrent_zoo():
    """The whole model zoo is servable: predictor_from_bundle wires a
    harness bundle's prepare/apply into the bucketed predictor with NaN
    length-padding (masks derive from NaN — forward-fill would fabricate
    observations).  Each ragged request's served rows must equal the
    direct bundle forward on the UNPADDED request: pad rows are causally
    isolated and the missingness pattern survives the padding."""
    from online_neural_cdes_tpu.serving import predictor_from_bundle
    from online_neural_cdes_tpu.training.harness import setup_model

    rng = np.random.default_rng(9)
    reqs = []
    for _ in range(5):
        L = int(rng.integers(4, 14))
        s = rng.normal(size=(L, 3)).astype(np.float32)
        s[rng.random(size=s.shape) < 0.25] = np.nan
        s[:, 0] = np.arange(L)  # time channel observed
        reqs.append(s)

    for model_string in ("gru-d", "gru-dt", "odernn"):
        bundle = setup_model(
            model_string, input_dim=3, output_dim=2, hidden_dim=6,
            hidden_hidden_dim=6, num_layers=1, return_sequences=True,
            adjoint=False,
        )
        params = bundle.init(jax.random.PRNGKey(0))
        pred = predictor_from_bundle(bundle, params,
                                     batch_buckets=(4,), length_multiple=8)
        assert pred.pad_forward_fill is False
        outs = pred.predict(reqs)
        for r, o in zip(reqs, outs):
            direct = np.asarray(bundle.apply_fn(
                params, bundle.prepare_batch(jnp.asarray(r)[None])))[0]
            np.testing.assert_allclose(o, direct[: len(r)],
                                       rtol=1e-5, atol=1e-6), model_string


def test_predictor_from_bundle_rejects_recurrent_one_shot():
    from online_neural_cdes_tpu.serving import predictor_from_bundle
    from online_neural_cdes_tpu.training.harness import setup_model

    bundle = setup_model("gru-d", input_dim=3, output_dim=2, hidden_dim=6,
                         return_sequences=False)
    with pytest.raises(ValueError, match="one-shot"):
        predictor_from_bundle(bundle, bundle.init(jax.random.PRNGKey(0)))


def test_step_many_matches_sequential_steps():
    """Catch-up blocks: step_many over a (K, B, C) backlog equals K
    sequential step() calls exactly (same per-tick arithmetic in one
    lax.scan dispatch)."""
    from online_neural_cdes_tpu.serving import OnlineNCDEStepper

    rng = np.random.default_rng(3)
    B, K, C = 4, 6, 3
    x = rng.normal(size=(B, K + 1, C)).astype(np.float32)
    x[:, :, 0] = np.arange(K + 1)
    x[2, 3, 1] = np.nan  # held value inside the block
    model = NeuralCDE(input_dim=C, hidden_dim=8, output_dim=2,
                      hidden_hidden_dim=8, num_layers=1,
                      interpolation="rectilinear", return_sequences=True,
                      adjoint=False, solver="rk4")
    stepper = OnlineNCDEStepper(model, model.init(jax.random.PRNGKey(0)))

    s_seq = stepper.init(x[:, 0])
    ys_seq = []
    for k in range(1, K + 1):
        s_seq, y = stepper.step(s_seq, x[:, k])
        ys_seq.append(np.asarray(y))

    s_blk = stepper.init(x[:, 0])
    xs = jnp.asarray(np.swapaxes(x[:, 1:], 0, 1))  # (K, B, C)
    s_blk, ys_blk = stepper.step_many(s_blk, xs)
    np.testing.assert_array_equal(np.asarray(ys_blk), np.stack(ys_seq))
    np.testing.assert_array_equal(np.asarray(s_blk["z"]),
                                  np.asarray(s_seq["z"]))
    np.testing.assert_array_equal(np.asarray(s_blk["last_obs"]),
                                  np.asarray(s_seq["last_obs"]))
