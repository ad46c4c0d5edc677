from .ssim import ssim, psnr
