from tpu_splat.core.transforms import (
    quat_to_rotmat,
    normalize,
    inverse_sigmoid,
    expon_lr_schedule,
)
from tpu_splat.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, num_sh_coeffs, SH_C0
from tpu_splat.core.graphics import (
    Camera,
    world_to_view,
    projection_from_fov,
    projection_from_K,
    fov2focal,
    focal2fov,
    camera_rays,
    reflect,
    env_rays_latlong1,
    env_rays_latlong2,
)
