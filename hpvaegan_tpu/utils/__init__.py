from .pyramid import (adjust_scales2image, get_scales_by_index,
                      get_fps_by_index, get_fps_td_by_index,
                      scale_size_2d, scale_size_3d)
from .noise import generate_noise
from .saver import DataSaver
