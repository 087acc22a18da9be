from tpu_splat.data.synthetic import random_scene, orbit_camera
