#!/usr/bin/env python3
"""Build a committed neuroglancer-precomputed layer whose chunks are
ENTROPY-CODED brotli (the `br` content encoding of the reference's
datasource/precomputed/common.py:18-29), plus a golden parquet twin of
a cutout for the DuckDB oracle.

The chunk payloads are deterministic uint32 segmentation-like volumes
(seeded RNG, run-heavy like real segmentation) encoded `raw` and then
wrapped with the REAL C brotli encoder (libbrotlienc 1.0.9, quality 9,
window 22 — the entropy path with context maps / block switching, not
the stored-mode subset our own encoder emits).  The Scala read path
(PrecomputedIO -> Brotli.decompress) must reproduce the original voxels
byte-exactly; the oracle parquet is written from the pre-compression
arrays, so the comparison validates our decoder against the C encoder
with no shared code on either side.

Layout: 64x64x64 uint32 volume, 32^3 chunks (8 chunks), one mip.
"""
import ctypes, json, os, struct
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "src/test/resources/golden")
LAYER = os.path.join(GOLD, "brotli_seg")
KEY = "16_16_40"

enc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlienc.so.1")
dec = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1")
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]


def brotli_q9(data: bytes) -> bytes:
    out_len = ctypes.c_size_t(len(data) + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    ok = enc.BrotliEncoderCompress(9, 22, 0, len(data), data, ctypes.byref(out_len), out)
    assert ok == 1
    comp = out.raw[: out_len.value]
    back_len = ctypes.c_size_t(len(data) + 16)
    back = ctypes.create_string_buffer(back_len.value)
    assert dec.BrotliDecoderDecompress(len(comp), comp, ctypes.byref(back_len), back) == 1
    assert back.raw[: back_len.value] == data
    # prove this is NOT a stored-mode stream (our own encoder's subset):
    # stored-mode of 128 KiB raw would be >= len(data); entropy must win
    assert len(comp) < len(data) // 4
    return comp


rng = np.random.default_rng(1720)
DIM = 64
CHUNK = 32
# run-heavy labels: nested split planes + some speckle, like real seg
vol = np.zeros((DIM, DIM, DIM), dtype=np.uint32)  # indexed [z][y][x]
for _ in range(40):
    x0, y0, z0 = rng.integers(0, DIM, 3)
    dx, dy, dz = rng.integers(4, 24, 3)
    label = int(rng.integers(1, 5000))
    vol[z0:z0 + dz, y0:y0 + dy, x0:x0 + dx] = label
speck = rng.random((DIM, DIM, DIM)) < 0.001
vol[speck] = rng.integers(5000, 2 ** 31, speck.sum(), dtype=np.uint32)

os.makedirs(os.path.join(LAYER, KEY), exist_ok=True)
info = {
    "data_type": "uint32",
    "num_channels": 1,
    "type": "segmentation",
    "scales": [{
        "key": KEY,
        "encoding": "raw",
        "resolution": [16, 16, 40],
        "size": [DIM, DIM, DIM],
        "voxel_offset": [0, 0, 0],
        "chunk_sizes": [[CHUNK, CHUNK, CHUNK]],
    }],
}
with open(os.path.join(LAYER, "info"), "w") as f:
    json.dump(info, f, indent=2)

total_comp = 0
for gz in range(DIM // CHUNK):
    for gy in range(DIM // CHUNK):
        for gx in range(DIM // CHUNK):
            sub = vol[gz * CHUNK:(gz + 1) * CHUNK,
                      gy * CHUNK:(gy + 1) * CHUNK,
                      gx * CHUNK:(gx + 1) * CHUNK]
            # precomputed `raw` is Fortran-order x-fastest: bytes of
            # [x + sx*(y + sy*z)] — sub is [z][y][x] C-order == that order
            raw = sub.tobytes(order="C")
            comp = brotli_q9(raw)
            total_comp += len(comp)
            name = (f"{gx*CHUNK}-{(gx+1)*CHUNK}_{gy*CHUNK}-{(gy+1)*CHUNK}"
                    f"_{gz*CHUNK}-{(gz+1)*CHUNK}.br")
            with open(os.path.join(LAYER, KEY, name), "wb") as f:
                f.write(comp)
print(f"8 chunks, {total_comp} compressed bytes "
      f"({total_comp / vol.nbytes:.3f} of raw)")

# golden cutout twin: bbox spanning all 8 chunks
x0, x1, y0, y1, z0, z1 = 20, 44, 24, 40, 28, 36
xs, ys, zs = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1),
                         np.arange(z0, z1), indexing="ij")
labels = vol[zs, ys, xs]
tbl = pa.table({
    "x": pa.array(xs.ravel(), pa.int64()),
    "y": pa.array(ys.ravel(), pa.int64()),
    "z": pa.array(zs.ravel(), pa.int64()),
    "label": pa.array(labels.ravel().astype(np.int64), pa.int64()),
})
pq.write_table(tbl, os.path.join(GOLD, "brotli_cutout.parquet"))
print("brotli_cutout.parquet", tbl.num_rows, "rows")
print("OK")
