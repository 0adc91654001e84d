from multiverse_tpu.ops.layers import (  # noqa: F401
    conv2d,
    init_conv,
    init_linear,
    linear,
    get_activation,
)
from multiverse_tpu.ops.convlstm import (  # noqa: F401
    ConvLSTMState,
    convlstm_init,
    convlstm_step,
    convlstm_scan,
)
from multiverse_tpu.ops.gnn import (  # noqa: F401
    gnn_neighbor_mask,
    gnn_step,
    gnn_step_auto,
    gnn_step_neighbors,
)
