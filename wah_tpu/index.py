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
        if len(vs) == 1:
            return self.streams[vs[0]]
        return self.codec.logical_many(
            [self.streams[v] for v in vs], "or", self.n_ints
        )

    def query_range(self, lo: int, hi: int) -> np.ndarray:
        """Compressed bitmap of rows where lo <= value <= hi."""
        return self.query_in(range(lo, hi + 1))

    def _universe(self) -> np.ndarray:
        """Compressed all-rows bitmap (bits [0, n_rows) set), cached —
        the tail mask that keeps complement results zero-padded."""
        u = getattr(self, "_universe_stream", None)
        if u is None:
            bits = np.zeros(self.n_ints * 32, np.uint8)
            bits[: self.n_rows] = 1
            bitmap = (
                np.packbits(bits, bitorder="little").view(np.uint32)
            )
            u, _ = self.codec.compress(bitmap)
            self._universe_stream = u
        return u

    def query_not(self, v: int) -> np.ndarray:
        """Rows where value != v: one compressed-domain complement (a
        pure stream rewrite, ops.logical.complement_stream) ANDed with
        the row universe to clear padding bits — O(1) logical ops
        instead of OR-ing the other C-1 columns."""
        import jax.numpy as jnp

        from .ops.logical import complement_stream

        s = self.streams[v]
        comp = np.asarray(complement_stream(jnp.asarray(s), len(s)))
        return self.codec.logical(comp, self._universe(), "and", self.n_ints)

    def rows(self, stream: np.ndarray) -> np.ndarray:
        """Materialize a compressed row bitmap into row ids."""
        bitmap, _ = self.codec.decompress(stream, out_ints=self.n_ints)
        bits = np.unpackbits(
            bitmap.view(np.uint8), bitorder="little"
        )[: self.n_rows]
        return np.flatnonzero(bits)

    def count(self, stream: np.ndarray) -> int:
        """Cardinality of a compressed row bitmap, computed in the
        compressed domain — one pass over the words (literal payload
        popcount + 31 * length per one-fill), no decompression. Exact
        because every index stream keeps padding bits zero (columns are
        built from zero-padded masks; logical ops mask the tail;
        query_not ANDs with the universe)."""
        w = np.ascontiguousarray(stream, dtype=np.uint32)
        is_fill = (w & np.uint32(0x80000000)) != 0
        is_ones = (w & np.uint32(0xC0000000)) == np.uint32(0xC0000000)
        lens = (w & np.uint32(0x3FFFFFFF)).astype(np.int64)
        lits = w[~is_fill]
        if hasattr(np, "bitwise_count"):
            lit_pop = int(np.bitwise_count(lits).sum())
        else:  # pragma: no cover - numpy < 2
            lit_pop = int(
                np.unpackbits(lits.view(np.uint8), bitorder="little").sum()
            )
        return lit_pop + 31 * int(lens[is_ones].sum())

    # -- size accounting ---------------------------------------------------
    def compressed_bytes(self) -> int:
        return sum(s.nbytes for s in self.streams)

    def uncompressed_bytes(self) -> int:
        return self.cardinality * self.n_ints * 4
