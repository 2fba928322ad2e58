from .render import (
    RenderingOutput,
    patch_render,
    render_camera,
    render_camera_host_loop,
    render_camera_sharded,
    camera_rays,
    depth_colormap,
    flow_to_rgb,
)
from .action_opt import (
    ActionOptResult,
    optimize_actions,
    solve_actions_least_squares,
)
from .sensitivity import (
    JACOBIAN_COLORMAP,
    compute_joint_sensitivity,
    visualize_joint_sensitivity,
    compute_joint_sensitivity_point_cloud,
)
from .loaders import parse_camera_json, load_model, resolve_checkpoint
