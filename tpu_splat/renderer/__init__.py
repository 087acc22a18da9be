from tpu_splat.renderer.render import (
    render,
    render_fast,
    render_env_map,
    depth_to_normal,
    RenderOutput,
)
