from multiverse_tpu.data.dataset import (  # noqa: F401
    TrajectoryDataset,
    read_data,
)
from multiverse_tpu.data.preprocess import preprocess_split  # noqa: F401
from multiverse_tpu.data.scene import (  # noqa: F401
    load_scene_id_map,
    scene_class_map_to_onehot,
)
