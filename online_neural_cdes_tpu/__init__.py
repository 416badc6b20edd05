"""online_neural_cdes_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Neural Controlled Differential Equations on online prediction tasks.

Re-designed from scratch with the capabilities of the reference repo
``jambo6/online-neural-cdes`` (Morrill, Kidger, Yang, Lyons,
arXiv:2106.11028).  The compute path is functional JAX: interpolation
coefficient builders are batched closed-form / scanned-tridiagonal kernels,
ODE solvers are ``lax.scan`` / ``lax.while_loop`` integrators, the CDE
vector-field contraction is a fused Pallas TPU kernel, and training steps
shard across chips through ``jax.sharding`` meshes.

Layout (mirrors SURVEY.md §2's component inventory):

- ``ops``       — interpolation schemes, ODE solvers, ``cdeint``, Pallas kernels,
                  log-signature windows.  (reference: ``modules/torchcde``,
                  ``modules/torchdiffeq``)
- ``models``    — NeuralCDE + vector fields, Stacked/Attention variants,
                  ODE-RNN, GRU-D, GRU baselines.  (reference: ``src/``)
- ``data``      — dataset preprocessing, loaders, builders, native C++
                  ragged kernels.  (reference: ``get_data/``)
- ``training``  — trainer loop, NaN-masked metrics, config grids, sweep
                  ledger, hyperopt, analysis.  (reference: ``experiments/``)
- ``parallel``  — mesh construction, data-parallel steps, seed-parallel
                  ensembles.  (reference has none; TPU-new)
- ``utils``     — parameter initialisers, checkpointing, profiling.

The reference's public API surface (torchcde/torchdiffeq exports plus the
model zoo) is re-exported flat below.
"""

__version__ = "0.1.0"

# torchdiffeq-equivalent exports
from online_neural_cdes_tpu.ops.solvers import odeint, odeint_event  # noqa: F401
from online_neural_cdes_tpu.ops.cdeint import odeint_adjoint, cdeint  # noqa: F401

# torchcde-equivalent exports
from online_neural_cdes_tpu.ops.interpolation import (  # noqa: F401
    CubicSpline,
    LinearInterpolation,
    NaturalCubicSpline,
    SmoothLinearInterpolation,
    TupleControl,
    hermite_cubic_coefficients_with_backward_differences,
    linear_interpolation_coeffs,
    natural_cubic_coeffs,
    natural_cubic_spline_coeffs,
)
from online_neural_cdes_tpu.ops.logsig import (  # noqa: F401
    logsig_windows,
    logsignature_windows,
)

# model zoo
from online_neural_cdes_tpu.models import (  # noqa: F401
    GRUD,
    ODERNN,
    RNN,
    AttentionNeuralCDE,
    NeuralCDE,
    StackedNeuralCDE,
    VectorField,
    prepare_gru_variant_data,
    sparsemax,
)

# serving / deployment surface (no reference counterpart)
from online_neural_cdes_tpu.serving import (  # noqa: F401
    OnlineNCDEStepper,
    Predictor,
    predictor_from_bundle,
)
from online_neural_cdes_tpu.serving_export import (  # noqa: F401
    export_predictor,
    export_stepper,
    load_predictor,
    load_stepper,
    update_params,
)
