from tpu_splat.train.losses import l1_loss, l2_loss, ssim, psnr
