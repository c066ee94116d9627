from ascii_renderer_tpu.atlas.io import (  # noqa: F401
    AtlasImage, load_atlas, save_atlas, valid_mask, stamp_ascii_art,
)
