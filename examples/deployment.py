"""The train -> deploy -> serve -> retrain arc, model-code-free.

A trained predictor's whole bucket grid is staged to StableHLO with
``serving_export.export_predictor`` (one self-contained directory: modules
+ params + manifest), reloaded WITHOUT the model object, served
bit-identically, scaled over a device mesh, and finally rolled forward to
a new checkpoint with ``update_params`` — no re-export, no model code in
the serving process.  ``params_dtype="bfloat16"`` shows the
reduced-precision artifact (half the weight payload).

Run from the repo root:  python examples/deployment.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from online_neural_cdes_tpu.models.ncde import NeuralCDE
from online_neural_cdes_tpu.ops.interpolation import linear_interpolation_coeffs
from online_neural_cdes_tpu.serving import Predictor
from online_neural_cdes_tpu.serving_export import (
    export_predictor,
    load_predictor,
    update_params,
)


def make_requests(n, C, seed=0):
    """Ragged raw series — time channel first, as the data pipeline emits."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        L = int(rng.integers(6, 20))
        s = rng.normal(size=(L, C)).astype(np.float32)
        s[:, 0] = np.arange(L)
        out.append(s)
    return out


def main():
    C = 3
    model = NeuralCDE(
        input_dim=C, hidden_dim=8, output_dim=2, num_layers=1,
        interpolation="linear", adjoint=False, solver="rk4",
    )
    params = model.init(jax.random.PRNGKey(0))  # stand-in for a trained ckpt
    live = Predictor(
        model, params, coeff_fn=linear_interpolation_coeffs,
        batch_buckets=(4,), length_multiple=8,
    )
    reqs = make_requests(4, C)

    with tempfile.TemporaryDirectory() as art:
        # 1. Export: the bucket grid staged to StableHLO, params as an
        #    argument (not a constant), so checkpoints stay swappable.
        n_shapes = export_predictor(
            live, art, channels=C, max_length=24, platforms=("cpu",),
        )
        print(f"exported {n_shapes} bucket shapes -> {art}")

        # 2. Serve model-code-free, bit-identical to the live predictor.
        served = load_predictor(art).predict(reqs)
        for a, b in zip(served, live.predict(reqs)):
            np.testing.assert_array_equal(a, b)
        print("loaded artifact serves bit-identically to the live predictor")

        # 3. Scale the SAME artifact over a device mesh (data-parallel
        #    serving; on one device the mesh is size 1 — the code path is
        #    identical on a slice).
        from online_neural_cdes_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(1)
        sharded = load_predictor(art, mesh=mesh).predict(reqs)
        for a, b in zip(sharded, served):
            np.testing.assert_array_equal(a, b)
        print(f"same artifact served over a {mesh.devices.size}-device mesh")

        # 4. Roll a retrained checkpoint in WITHOUT re-export: params.npz
        #    rewrites atomically; architecture is validated first.
        new_params = model.init(jax.random.PRNGKey(7))
        update_params(art, new_params)
        rolled = load_predictor(art).predict(reqs)
        fresh = Predictor(
            model, new_params, coeff_fn=linear_interpolation_coeffs,
            batch_buckets=(4,), length_multiple=8,
        )
        for a, b in zip(rolled, fresh.predict(reqs)):
            np.testing.assert_array_equal(a, b)
        print("update_params rolled the new checkpoint in (no re-export)")

    # 5. Reduced-precision artifact: weights stored bfloat16 — half the
    #    payload, outputs within bf16 tolerance of f32.
    with tempfile.TemporaryDirectory() as art16:
        export_predictor(
            live, art16, channels=C, max_length=24, platforms=("cpu",),
            params_dtype="bfloat16",
        )
        outs16 = load_predictor(art16).predict(reqs)
        scale = max(float(np.max(np.abs(o))) for o in served)
        dev = max(
            float(np.max(np.abs(a - b))) for a, b in zip(outs16, served)
        ) / scale
        print(f"bf16 artifact: relative deviation {dev:.1%} of output scale")
    print("deployment arc complete")


if __name__ == "__main__":
    main()
