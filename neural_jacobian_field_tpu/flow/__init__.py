from .raft import (
    RAFT,
    InputPadder,
    compute_video_flow,
    resize_batched_flow,
    resize_batched_frames,
    load_torch_raft_state_dict,
)
