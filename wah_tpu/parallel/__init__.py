"""Multi-chip parallelism: mesh construction + sharded encode/decode."""
from .dist import (
    AXIS,
    ShardedCodec,
    decode_sharded,
    encode_sharded,
    gather_bitmap,
    gather_stream,
    make_mesh,
    stitch_global,
)

__all__ = [
    "AXIS",
    "ShardedCodec",
    "decode_sharded",
    "encode_sharded",
    "gather_bitmap",
    "gather_stream",
    "make_mesh",
    "stitch_global",
]
