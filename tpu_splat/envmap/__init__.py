from tpu_splat.envmap.cubemap import (
    CubemapParams,
    init_cubemap,
    sample_cubemap,
    resize_cubemap,
    sharpen_cubemap,
)
