from online_neural_cdes_tpu.models.vector_fields import VectorField, VECTOR_FIELDS  # noqa: F401
from online_neural_cdes_tpu.models.ncde import NeuralCDE, SPLINES  # noqa: F401
from online_neural_cdes_tpu.models.stacked import StackedNeuralCDE  # noqa: F401
from online_neural_cdes_tpu.models.attention import AttentionNeuralCDE, sparsemax  # noqa: F401
from online_neural_cdes_tpu.models.odernn import ODERNN  # noqa: F401
from online_neural_cdes_tpu.models.grud import GRUD, prepare_gru_variant_data  # noqa: F401
from online_neural_cdes_tpu.models.rnn import RNN  # noqa: F401
