from .conventions import (
    post_process_camera_to_world,
    normalize,
    normalize_intrinsics,
    denormalize_intrinsics,
    get_traj_and_frame_idx,
    get_optical_flow_filename,
    get_trgt_view_filename,
)
from .dataparser import (
    DataparserConfig,
    DataparserOutputs,
    parse_transforms,
    merge_dataparser_outputs,
    auto_orient_and_center_poses,
)
from .dataset import (
    DatasetCfgCommon,
    DatasetCommon,
    DatasetAllegro,
    DatasetToyArm,
    DatasetHsa,
    DatasetPneumaticHandOnly,
    DATASETS,
    get_dataset,
)
from .loader import DataLoader, ValidationWrapper, collate
from .synthetic import make_synthetic_scene
from .augmentation import (
    RandomBackground,
    ZeroMaskPatchedImage,
    get_random_image,
    random_horizontal_flip,
    random_vertical_flip,
)
