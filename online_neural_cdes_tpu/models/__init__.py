from online_neural_cdes_tpu.models.vector_fields import VectorField, VECTOR_FIELDS  # noqa: F401
from online_neural_cdes_tpu.models.ncde import NeuralCDE, SPLINES  # noqa: F401
