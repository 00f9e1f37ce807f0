#!/usr/bin/env python3
"""cProfile the single-thread encode/decode kernels over the FIXTURES profiles.

Usage: python tools/kernel_profile.py [scale] [encode|decode|both]
Prints the top cumulative-time functions — the feedback loop for kernel work.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    which = sys.argv[2] if len(sys.argv) > 2 else "both"

    from tokenlake.decode_job import decode_chunk
    from tokenlake.encode_job import encode_chunk
    from tokenlake.schema import generate_sequences

    tbl = generate_sequences(scale=scale)
    tbl = tbl.append_column(
        "chunk_id",
        pc.binary_join_element_wise(
            tbl.column("source").cast(pa.string()), pa.array(["0"] * len(tbl)), "#"
        ),
    )
    tbl = tbl.append_column("nbuckets", pa.array(np.ones(len(tbl), np.int32)))

    def conv(t):
        toks = t.column("tokens").combine_chunks().cast(pa.list_(pa.int32()))
        return t.set_column(t.schema.get_field_index("tokens"), "tokens", toks)

    srcs = tbl.column("source").unique().to_pylist()
    chunks = [conv(tbl.filter(pc.equal(tbl.column("source"), s))) for s in srcs]

    enc = [encode_chunk(c) for c in chunks]  # warm
    decode_chunk(enc[0])

    if which in ("encode", "both"):
        pr = cProfile.Profile()
        pr.enable()
        for c in chunks:
            encode_chunk(c)
        pr.disable()
        print("=== encode ===")
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)

    if which in ("decode", "both"):
        pr = cProfile.Profile()
        pr.enable()
        for e in enc:
            decode_chunk(e)
        pr.disable()
        print("=== decode ===")
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
