from .image import SingleImageDataset, make_image_batch_fn
from .video import SingleVideoDataset, make_video_batch_fn
