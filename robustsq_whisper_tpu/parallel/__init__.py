from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_shardings,
    init_distributed,
    make_mesh,
    param_pspec,
    params_shardings,
    replicated,
)
