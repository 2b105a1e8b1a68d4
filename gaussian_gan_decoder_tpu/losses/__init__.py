from .image import l1_loss, l2_loss, ssim, sobel_loss, area_downsample
from .lpips import VGG16LPIPS, lpips_loss
from .id_loss import IRSE50, id_loss, id_similarity
