"""Bitmap index over compressed WAH columns — the workload the WAH
format exists for (the reference implements the codec the DEXA-2010
paper uses for exactly this; the index layer itself is new here).

One column per distinct value of a low-cardinality attribute: bit r of
column v is set iff row r has value v. Columns are built on device in
one batched pipeline (`ops.encode.encode_batch` — the column axis is a
vmapped leading dim) and stored compressed; equality/membership/range
queries combine columns with the compressed-domain logical ops.

    idx = BitmapIndex.build(values, cardinality=8)
    hit_stream = idx.query_eq(3)              # compressed row bitmap
    rows = idx.rows(hit_stream)               # row ids (np.ndarray)
    s = idx.query_range(2, 5)                 # 2 <= v <= 5
    s = idx.query_in([1, 4, 7])               # membership
"""
from __future__ import annotations

import numpy as np

from .api import WahCodec
from .constants import BLOCK_CHUNKS
from .golden import chunk_count

__all__ = ["BitmapIndex"]


def _bitmap_from_mask(mask: np.ndarray) -> np.ndarray:
    return (
        np.packbits(
            mask.astype(np.uint8).reshape(-1, 8)[:, :],
            axis=1,
            bitorder="little",
        )
        .reshape(-1, 4)
        .view(np.uint32)
        .reshape(-1)
    )


class BitmapIndex:
    """Equality-encoded bitmap index with WAH-compressed columns."""

    def __init__(self, streams: list[np.ndarray], n_rows: int,
                 codec: WahCodec | None = None):
        self.streams = streams
        self.n_rows = n_rows
        self.n_ints = -(-n_rows // 32)
        self.codec = codec or WahCodec()

    @classmethod
    def build(
        cls,
        values: np.ndarray,
        cardinality: int | None = None,
        codec: WahCodec | None = None,
    ) -> "BitmapIndex":
        """values: (n_rows,) small non-negative ints -> one compressed
        column per value in [0, cardinality)."""
        values = np.asarray(values)
        assert values.ndim == 1 and values.size > 0
        C = int(cardinality if cardinality is not None
                else int(values.max()) + 1)
        n_rows = values.shape[0]
        n_ints = -(-n_rows // 32)
        pad_rows = n_ints * 32
        vpad = np.full(pad_rows, -1, dtype=np.int64)
        vpad[:n_rows] = values
        columns = np.stack(
            [_bitmap_from_mask(vpad == v) for v in range(C)]
        )
        codec = codec or WahCodec()
        words, totals = codec.compress_batch(columns)
        streams = [words[c, : totals[c]].copy() for c in range(C)]
        return cls(streams, n_rows, codec)

    @property
    def cardinality(self) -> int:
        return len(self.streams)

    def column(self, v: int) -> np.ndarray:
        return self.streams[v]

    def query_eq(self, v: int) -> np.ndarray:
        """Compressed bitmap of rows where value == v."""
        return self.streams[v]

    def query_in(self, vs) -> np.ndarray:
        """Compressed bitmap of rows where value in vs (OR-reduction in
        the compressed domain)."""
        vs = list(vs)
        assert vs, "empty membership set"
        acc = self.streams[vs[0]]
        for v in vs[1:]:
            acc = self.codec.logical(acc, self.streams[v], "or", self.n_ints)
        return acc

    def query_range(self, lo: int, hi: int) -> np.ndarray:
        """Compressed bitmap of rows where lo <= value <= hi."""
        return self.query_in(range(lo, hi + 1))

    def query_not(self, v: int) -> np.ndarray:
        """Rows where value != v (complement within the row universe)."""
        others = [u for u in range(self.cardinality) if u != v]
        return self.query_in(others)

    def rows(self, stream: np.ndarray) -> np.ndarray:
        """Materialize a compressed row bitmap into row ids."""
        bitmap, _ = self.codec.decompress(stream, out_ints=self.n_ints)
        bits = np.unpackbits(
            bitmap.view(np.uint8), bitorder="little"
        )[: self.n_rows]
        return np.flatnonzero(bits)

    def count(self, stream: np.ndarray) -> int:
        """Cardinality of a compressed row bitmap (popcount after
        decompress; fills make this cheap for selective queries)."""
        bitmap, _ = self.codec.decompress(stream, out_ints=self.n_ints)
        return int(
            np.unpackbits(bitmap.view(np.uint8), bitorder="little")[
                : self.n_rows
            ].sum()
        )

    # -- size accounting ---------------------------------------------------
    def compressed_bytes(self) -> int:
        return sum(s.nbytes for s in self.streams)

    def uncompressed_bytes(self) -> int:
        return self.cardinality * self.n_ints * 4
