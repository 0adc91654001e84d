from multiverse_tpu.models.multiverse import (  # noqa: F401
    Batch,
    ForwardOutputs,
    init_params,
    model_forward,
    compute_loss,
    soft_grid_labels,
    SOFT_GRID_KERNELS,
)
from multiverse_tpu.models.beam_search import (  # noqa: F401
    BeamOutputs,
    diverse_beam_search,
)
