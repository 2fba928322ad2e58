from .view_interpolation import (
    interpolate_pose,
    interpolate_intrinsics,
    generate_wobble,
    reproj_best,
    cosine_smooth,
)
from .validation import (
    render_interpolated_view,
    draw_pixel_motion,
    draw_point_matches,
    ping_pong,
)
