"""2D pipeline typed config — the reference's jacobian/config/common.py:12-60
schema on the shared YAML-group/override machinery (config/tools.py).

Same group surface as the reference's jacobian/configurations tree:
  python -m neural_jacobian_field_tpu.train2d \
      dataset=pusher_only wrapper=pusher_only dataset.root=... \
      training.max_steps=2000
"""

from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Union

from ..config.common import WandbCfg
from .models import TransformerJacobianFieldCfg, UnetJacobianFieldCfg


@dataclass(frozen=True)
class Optim2DCfg:
    """wrapper/*.yaml optim group (model_wrapper_pusher.py cfg)."""

    lr: float = 1e-4
    warm_up_steps: int = 10000
    weight_decay: float = 1e-5


@dataclass(frozen=True)
class Wrapper2DCfg:
    """jacobian/models/model_wrapper_base.py ModelWrapperCfg union: the
    `name` picks the training wrapper (pusher | planar_hand); `model` is the
    name-discriminated Jacobian-field union."""

    name: str = "pusher"
    optim: Optim2DCfg = field(default_factory=Optim2DCfg)
    model: Union[UnetJacobianFieldCfg, TransformerJacobianFieldCfg] = field(
        default_factory=UnetJacobianFieldCfg
    )


@dataclass(frozen=True)
class Dataset2DGroupCfg:
    """jacobian/dataset/*.yaml group (pusher_dataset.py:17-20)."""

    name: str = "pusher"
    root: Path = Path("/tmp/njf_2d_data")
    command_dim: int = 2
    action_scale: float = 4.0
    new_H: Optional[int] = None
    new_W: Optional[int] = None


@dataclass(frozen=True)
class DataLoader2DCfg:
    batch_size: int = 12
    num_workers: int = 2


@dataclass(frozen=True)
class Training2DCfg:
    data: DataLoader2DCfg = field(default_factory=DataLoader2DCfg)
    val_check_interval: int = 500
    max_steps: int = 2000


@dataclass(frozen=True)
class Checkpoint2DCfg:
    every_n_train_steps: int = 500
    load: Optional[str] = None
    out: Optional[Path] = None  # params .npz path (examples/tutorial_2+3)


@dataclass(frozen=True)
class Pipeline2DCfg:
    """jacobian/config/common.py:43-47."""

    dataset: Dataset2DGroupCfg = field(default_factory=Dataset2DGroupCfg)
    wrapper: Wrapper2DCfg = field(default_factory=Wrapper2DCfg)
    wandb: WandbCfg = field(default_factory=WandbCfg)
    training: Training2DCfg = field(default_factory=Training2DCfg)
    checkpoint: Checkpoint2DCfg = field(default_factory=Checkpoint2DCfg)
    seed: int = 0
    # generate a synthetic trajectory set under dataset.root when it is empty
    # (keeps tutorial-1 runnable without MuJoCo)
    make_synthetic: bool = False


def get_typed_2d_config(cfg_dict) -> Pipeline2DCfg:
    from ..config.tools import from_dict

    return from_dict(Pipeline2DCfg, cfg_dict)
