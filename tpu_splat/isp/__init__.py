from tpu_splat.isp.ppisp import ISPConfig, ISPParams, init_isp, apply_isp, isp_regularization
