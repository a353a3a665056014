from .images import (  # noqa: F401
    block_embedding,
    decode_stats,
    encode_pixels,
    phash_udf_frame,
    psnr,
    psnr_frame,
    resize_images,
    sgi_decode,
    sgi_encode,
    sgi_try_decode,
    frame_sample,
    image_profile,
)
