from tpu_splat.dist.mesh import make_mesh, device_count, multihost_init
