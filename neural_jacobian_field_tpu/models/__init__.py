from .resnet_fc import MlpCfg, ResnetFC
from .encoder_resnet import EncoderResnetCfg, EncoderResnet
from .transformer import Transformer
from .decoders import (
    DensityDecoderMlpCfg,
    DensityDecoderMlp,
    ActionDecoderJacobianMlpCfg,
    ActionDecoderJacobianTransformerCfg,
    ActionDecoderFlowMlpCfg,
    TransformerCfg,
    PixelEncoding,
)
from .model import (
    Model,
    ModelCfg,
    RenderingCfg,
    CameraInput,
    RenderingInput,
    RobotInput,
    ModelInput,
    ModelTarget,
    ModelOutput,
    ModelInferenceEncoding,
    StepCtx,
    step_schedules,
    make_model_cfg,
)
