#!/usr/bin/env python3
"""Synthesize the sharded-image golden fixture from the reference's
committed real data, plus its voxel-cutout oracle parquet.

The reference commits test_cv_sharded/ as METADATA ONLY (info +
provenance — no shard data file exists anywhere under its test tree).
To put real committed bytes through the sharded image READ path end to
end (datasource/precomputed/image/rx.py:39-155 + sharding.py:279-820),
this tool:

 1. takes the committed compresso chunks of test_seg_unsharded/32_32_40
    (8 chunks, 256x256x64 uint32) VERBATIM — the gunzipped payloads are
    the reference's own bytes, unmodified;
 2. assembles them into one shard file under the EXACT sharding spec
    committed in test_cv_sharded/info (neuroglancer_uint64_sharded_v1,
    preshift_bits=9, minishard_bits=0, shard_bits=0, hash=identity,
    data_encoding=gzip, minishard_index_encoding=gzip), using an
    INDEPENDENT implementation of the shard container: compressed-
    morton chunk ids (rx.py:75-84), tri-run delta minishard index
    (sharding.py:401-417), fixed index relative to index end
    (sharding.py:392-417);
 3. writes the layer (info + 32_32_40/0.shard) as a committed test
    resource, and sharded_cutout.parquet — oracle voxels for a
    z-chunk-border-spanning bbox decoded straight from the COMMITTED
    UNSHARDED bytes by the independent compresso decoder
    (compresso_oracle_gen.decode), never from the synthesized shard.

Chunk geometry follows the data-carrying layer (256x256x64 over a
256x256x512 volume); the sharding parameters and encodings are
test_cv_sharded's verbatim. The Spark entry s5c_cutout_sharded_golden
reads the shard through ShardedIO (shard index -> minishard index ->
ranged gunzip -> compresso decode) and must match the oracle parquet.
"""
import glob
import gzip
import json
import math
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compresso_oracle_gen as cg

REF = "/root/reference/test/test_seg_unsharded/32_32_40"
SHARDED_INFO = "/root/reference/test/test_cv_sharded/info"
OUT = "/root/repo/src/test/resources/golden"
LAYER = os.path.join(OUT, "sharded_seg")

SIZE = (256, 256, 512)
CHUNK = (256, 256, 64)
# bbox for the oracle cutout: spans the z=128 chunk border in the most
# label-dense window (36 distinct labels across the two chunks)
CUT = (128, 160, 192, 224, 120, 136)  # x0,x1,y0,y1,z0,z1


def compressed_morton(g, grid):
    """Compressed morton code (rx.py:75-84): interleave bits of the
    grid coordinate, skipping axes whose grid extent is exhausted."""
    bits = [max(1, math.ceil(math.log2(d))) if d > 1 else 0 for d in grid]
    code = 0
    pos = 0
    for j in range(max(bits) if bits else 0):
        for a in range(3):
            if j < bits[a]:
                code |= ((g[a] >> j) & 1) << pos
                pos += 1
    return code


def synthesize_shard(records):
    """records: sorted list of (chunk_id, payload_bytes). One shard,
    one minishard (minishard_bits=0), gzip data + gzip index."""
    gz = [gzip.compress(p) for _, p in records]
    data = b"".join(gz)
    n = len(records)
    idx = np.zeros(3 * n, "<u8")
    last = 0
    for i, (cid, _) in enumerate(records):
        idx[i] = cid - last          # label delta
        idx[n + i] = 0               # offset delta: contiguous records
        idx[2 * n + i] = len(gz[i])  # stored (gzipped) size
        last = cid
    mini = gzip.compress(idx.tobytes())
    # fixed index: 2^minishard_bits = 1 pair of u64le [start, end),
    # relative to the END of the fixed index
    fixed = struct.pack("<QQ", len(data), len(data) + len(mini))
    return fixed + data + mini


def main():
    grid = tuple((SIZE[i] + CHUNK[i] - 1) // CHUNK[i] for i in range(3))
    assert grid == (1, 1, 8), grid

    sharding = json.load(open(SHARDED_INFO))["scales"][0]["sharding"]
    assert sharding == {
        "@type": "neuroglancer_uint64_sharded_v1",
        "data_encoding": "gzip", "hash": "identity",
        "minishard_bits": 0, "minishard_index_encoding": "gzip",
        "preshift_bits": 9, "shard_bits": 0,
    }, sharding

    records = []
    vol = np.zeros((SIZE[2], SIZE[1], SIZE[0]), np.uint32)
    for f in sorted(glob.glob(os.path.join(REF, "*.gz"))):
        x0, y0, z0 = cg.chunk_origin(f)
        g = (x0 // CHUNK[0], y0 // CHUNK[1], z0 // CHUNK[2])
        cid = compressed_morton(g, grid)
        # all ids < 2^preshift_bits -> shard 0, minishard 0 (identity hash)
        assert cid >> sharding["preshift_bits"] == 0
        with gzip.open(f, "rb") as fh:
            records.append((cid, fh.read()))  # committed bytes, verbatim
        vol[z0:z0 + CHUNK[2], y0:y0 + CHUNK[1], x0:x0 + CHUNK[0]] = \
            cg.decode(f)  # independent decode for the oracle
    records.sort(key=lambda t: t[0])
    assert len(records) == 8

    os.makedirs(os.path.join(LAYER, "32_32_40"), exist_ok=True)
    with open(os.path.join(LAYER, "32_32_40", "0.shard"), "wb") as fh:
        fh.write(synthesize_shard(records))
    info = {
        "data_type": "uint32", "num_channels": 1, "type": "segmentation",
        "scales": [{
            "key": "32_32_40", "encoding": "compresso",
            "resolution": [32, 32, 40], "size": list(SIZE),
            "chunk_sizes": [list(CHUNK)], "voxel_offset": [0, 0, 0],
            "sharding": sharding,
        }],
    }
    with open(os.path.join(LAYER, "info"), "w") as fh:
        json.dump(info, fh, indent=2, sort_keys=True)

    x0, x1, y0, y1, z0, z1 = CUT
    sub = vol[z0:z1, y0:y1, x0:x1]
    zz, yy, xx = np.meshgrid(np.arange(z0, z1), np.arange(y0, y1),
                             np.arange(x0, x1), indexing="ij")
    pq.write_table(pa.table({
        "x": xx.ravel().astype(np.int64),
        "y": yy.ravel().astype(np.int64),
        "z": zz.ravel().astype(np.int64),
        "label": sub.ravel().astype(np.int64),
    }), os.path.join(OUT, "sharded_cutout.parquet"))
    print(f"layer: {LAYER} (shard "
          f"{os.path.getsize(os.path.join(LAYER, '32_32_40', '0.shard'))} B); "
          f"cutout rows: {sub.size}; distinct labels: "
          f"{len(np.unique(sub))}")


if __name__ == "__main__":
    main()
