"""Streaming (online) inference: advance a trained rectilinear NCDE one
observation at a time with ``serving.OnlineNCDEStepper``.

The offline model consumes a whole precomputed coefficient array; in
production an online task receives observations incrementally.  Because
rectilinear interpolation appends exactly two control pieces per
observation, the hidden state advances incrementally and matches the
offline forward exactly.

Run from the repo root:  python examples/streaming_inference.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.serving import OnlineNCDEStepper


def main():
    B, L, C = 8, 12, 3
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    x[:, :, 0] = np.arange(L)                    # time channel
    x[rng.random(size=x.shape) < 0.2] = np.nan   # missing values
    x[:, :, 0] = np.arange(L)

    model = NeuralCDE(
        input_dim=C, hidden_dim=8, output_dim=1, num_layers=1,
        interpolation="rectilinear", return_sequences=True,
        adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))

    # Offline: one batched forward over the full (precomputed) path.
    coeffs = linear_interpolation_coeffs(jnp.asarray(x), rectilinear=0)
    offline = np.asarray(model.apply(params, coeffs))[..., 0]   # (B, L)

    # Online: feed observations one at a time.
    stepper = OnlineNCDEStepper(model, params)
    state = stepper.init(jnp.asarray(x[:, 0]))
    print("t=0   offline", offline[0, 0].round(4),
          "streaming", float(stepper.readout(state["z"])[0, 0]).__round__(4))
    for t in range(1, L):
        state, y = stepper.step(state, jnp.asarray(x[:, t]))
        # Offline scan and streaming stepper are different compiled
        # programs; on TPU the bf16 MXU passes differ in rounding, so
        # report the worst deviation across the batch rather than a
        # tolerance boolean (typically ~1e-6 on CPU, ~1e-3 on TPU).
        diff = float(np.max(np.abs(np.asarray(y)[:, 0] - offline[:, t])))
        print(f"t={t:<3d} offline {offline[0, t]:+.4f}  "
              f"streaming {float(y[0, 0]):+.4f}  max|batch diff|={diff:.1e}")

    # Batched serving with throughput mode: ragged request batches pad
    # into the precompiled bucket grid; ``predict_many`` keeps several
    # dispatched batches ahead of the sync point, so each batch's
    # transfer + sync overlaps the previous batches' compute (outputs
    # are bit-identical to per-call ``predict``).
    from online_neural_cdes_tpu.serving import Predictor

    batch_model = NeuralCDE(
        input_dim=C, hidden_dim=8, output_dim=1, num_layers=1,
        interpolation="linear", return_sequences=False,
        adjoint=False, solver="rk4",
    )
    predictor = Predictor(
        batch_model, batch_model.init(jax.random.PRNGKey(1)),
        coeff_fn=linear_interpolation_coeffs,
        batch_buckets=(8,), length_multiple=8,
    )
    ragged = [x[i, : int(rng.integers(4, L))] for i in range(B)]
    batches = [ragged[:5], ragged[5:]]
    many = predictor.predict_many(batches, in_flight=2)
    per_call = [predictor.predict(b) for b in batches]
    same = all(
        np.array_equal(o, e)
        for outs, expected in zip(many, per_call)
        for o, e in zip(outs, expected)
    )
    print("predict_many (throughput mode) == per-call predict:", same)

    # AOT deployment: stage the predictor's whole bucket grid (coefficient
    # build + forward) to a StableHLO artifact with jax.export, then serve
    # it back WITHOUT the model object — what a production server loads.
    import tempfile

    from online_neural_cdes_tpu.serving_export import (
        export_predictor, load_predictor,
    )

    with tempfile.TemporaryDirectory() as art:
        n = export_predictor(
            predictor, art, channels=C, max_length=L,
            platforms=(jax.default_backend(),),
        )
        loaded = load_predictor(art)
        again = loaded.predict(batches[0])
        same = all(
            np.array_equal(a, b) for a, b in zip(again, per_call[0])
        )
        print(f"AOT artifact ({n} shapes) serves identically:", same)


if __name__ == "__main__":
    main()
