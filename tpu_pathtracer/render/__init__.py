from .state import RenderState, accumulate, init_state, render_frame, render_frame_jit  # noqa: F401
from .wavefront import PathState, initial_path_state, make_brute_intersector, render_sample, trace_bounce  # noqa: F401
