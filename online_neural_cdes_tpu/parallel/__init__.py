from online_neural_cdes_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from online_neural_cdes_tpu.parallel.sequence import (  # noqa: F401
    make_sequence_mesh,
    ncde_apply_pipelined,
    pipelined_cde_solve,
)
