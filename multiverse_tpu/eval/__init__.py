from multiverse_tpu.eval.multifuture import (  # noqa: F401
    evaluate_multifuture_nll,
    evaluate_multifuture_trajs,
)
from multiverse_tpu.eval.sdd import evaluate_sdd  # noqa: F401
