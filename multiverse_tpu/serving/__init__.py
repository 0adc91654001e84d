from multiverse_tpu.serving.engine import (  # noqa: F401
    PredictionResult,
    ServingEngine,
)
