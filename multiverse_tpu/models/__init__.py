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
from multiverse_tpu.models.simaug import (  # noqa: F401
    MultiviewBatch,
    SimAugConfig,
    make_simaug_train_step,
    multiview_augmentation,
    simaug_loss,
    white_box_attack,
)
