"""Faithful lockstep simulation of the reference GPU encode kernel.

Models compressData (reference: kernels.cu:51-262) at warp granularity with
sm_60 lockstep SIMT semantics: during the block-leader merge phase
(kernels.cu:184-229) every lane's loop *reads* of counts / beginnings /
endings / endLengths observe the pre-merge values, because the overwrites
(kernels.cu:219,228) happen after loop reconvergence.

Purpose: an executable proof of the reference's semantics, used by
tests/test_golden.py to show that (a) the kernel performs *complete*
run-length coalescing within each 1024-chunk block, and (b) the committed
expected vectors for blockMergeWanderingLiterals (tests.cpp:66-77) are
stale with respect to the kernel.

Only defined-behavior inputs are supported: full 992-int blocks
(the reference is UB for other sizes, SURVEY.md section 4.1).
"""
from __future__ import annotations

import numpy as np

from wah_tpu.constants import (
    BIT31,
    BIT3130,
    ONES31,
    WORD_LITERAL,
    WORD_ONES,
    WORD_ZEROS,
)
from wah_tpu.golden import repartition_chunks


def _encode_block(chunks: np.ndarray) -> list[int]:
    """Simulate compressData for one full block (32 warps x 32 chunks)."""
    assert chunks.shape == (1024,)
    t = np.full(1024, WORD_LITERAL, dtype=np.int64)
    t[chunks == 0] = WORD_ZEROS
    t[chunks == ONES31] = WORD_ONES
    tw = t.reshape(32, 32)

    # per-lane run-end flags (kernels.cu:126-141); lane 31 always flagged
    ends = np.empty((32, 32), dtype=bool)
    ends[:, :31] = (tw[:, :31] != tw[:, 1:]) | (tw[:, :31] == WORD_LITERAL)
    ends[:, 31] = True

    counts = ends.sum(axis=1)  # words per warp (kernels.cu:177-179)
    beginnings = tw[:, 0]  # type of first run (kernels.cu:151-153)
    endings = tw[:, 31]  # type of last chunk (kernels.cu:30-34)

    # run length ending at each flagged lane (kernels.cu:155-162)
    run_len = np.zeros((32, 32), dtype=np.int64)
    for w in range(32):
        prev = -1
        for i in range(32):
            if ends[w, i]:
                run_len[w, i] = i - prev
                prev = i
    # endLengths: trailing run length if the warp ends in a fill, else 0
    end_lengths = np.where(endings != WORD_LITERAL, run_len[:, 31], 0)

    # --- merge phase (kernels.cu:184-229), lockstep: all reads pre-merge ---
    merged = np.zeros(32, dtype=bool)
    bonus = np.zeros(32, dtype=np.int64)
    for wid in range(32):  # each lane of warp 0 handles one warp
        is_head = (
            wid == 31
            or endings[wid] != beginnings[wid + 1]
            or endings[wid] == WORD_LITERAL
            or counts[wid] > 1
        )
        if not is_head:
            continue
        i = 1
        b = 0
        while True:
            if (
                i < wid
                and counts[wid - i] == 1
                and beginnings[wid] == endings[wid - i]
                and beginnings[wid] != WORD_LITERAL
            ):
                merged[wid - i] = True
                b += end_lengths[wid - i]
                i += 1
            elif (
                i <= wid
                and beginnings[wid] == endings[wid - i]
                and beginnings[wid] != WORD_LITERAL
            ):
                merged[wid - i] = True
                b += end_lengths[wid - i]
                i += 1
                break
            else:
                break
        bonus[wid] = b

    # --- emission (kernels.cu:237-259) ---
    out: list[int] = []
    cw = chunks.reshape(32, 32)
    for w in range(32):
        first = True
        for i in range(32):
            if not ends[w, i]:
                continue
            if i == 31 and merged[w]:
                first = False
                continue
            extra = bonus[w] if first else 0
            first = False
            if tw[w, i] == WORD_ONES:
                out.append(BIT3130 | int(run_len[w, i] + extra))
            elif tw[w, i] == WORD_ZEROS:
                out.append(BIT31 | int(run_len[w, i] + extra))
            else:
                out.append(int(cw[w, i]))
    return out


def encode(ints: np.ndarray) -> np.ndarray:
    """Simulated reference compress() for full-block inputs."""
    ints = np.asarray(ints, dtype=np.uint32)
    assert ints.shape[0] % 992 == 0, "reference behavior defined for full blocks only"
    chunks = repartition_chunks(ints).reshape(-1, 1024)
    out: list[int] = []
    for b in range(chunks.shape[0]):
        out.extend(_encode_block(chunks[b]))
    return np.array(out, dtype=np.uint32)
