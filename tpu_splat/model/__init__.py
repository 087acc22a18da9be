from tpu_splat.model.state import GaussianState, init_from_pcd, sh_band_mask
