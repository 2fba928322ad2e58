from .unet import UNet
from .vit import ViTS14, ViTCfg, load_torch_dinov2_state_dict
from .models import (
    JacobianFieldCfg,
    JacobianNetOutput,
    UnetJacobianFieldCfg,
    UnetJacobianField,
    TransformerJacobianFieldCfg,
    TransformerJacobianField,
    MODELS_2D,
    get_model,
    compute_sensitivity,
)
from .dataset import (
    Dataset2D,
    Dataset2DCfg,
    collate_2d,
    load_gzip_file,
    save_gzip_file,
    make_synthetic_trajectories,
)
from .train import (
    Train2DCfg,
    TrainState2D,
    create_train_state_2d,
    make_train_step_2d,
)
from .control import control_step
from .visualize import (
    visualize_model,
    visualize_sensitivity,
    flow_video,
    create_video_grid,
)
