from .resize import (resize_linear, resize_bilinear, resize_trilinear,
                     upscale_2d, upscale_3d)
from .conv import conv2d_init, conv2d_apply, conv3d_init, conv3d_apply
from .norm import batchnorm_init, batchnorm_apply
from .spectral_norm import sn_conv_init, sn_conv_apply
