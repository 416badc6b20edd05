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
- ``data``      — dataset preprocessing: normalisation, time channels,
                  interpolation precompute, splits.  (reference: ``get_data/``)
- ``training``  — trainer loop, NaN-masked metrics, config grids, sweep
                  ledger, hyperopt.  (reference: ``experiments/``)
- ``parallel``  — mesh construction, data-parallel train steps, multi-host
                  helpers.  (reference has none; this is TPU-new)
- ``utils``     — parameter initialisers, pytree helpers.
"""

__version__ = "0.1.0"

from online_neural_cdes_tpu.ops import interpolation, solvers, cdeint  # noqa: F401
