"""Convenience re-exports mirroring the reference's `utils/` +
`core/utils/` surface (ref: 1st.../utils/store_image.py,
2nd.../core/utils/{image_util,file_util,train_util}.py)."""

from hosnerf_tpu.eval.io import (store_image, store_video, tile_images,  # noqa: F401
                                 to_8b_image, write_stats)
from hosnerf_tpu.utils.file_util import list_files, split_path  # noqa: F401
