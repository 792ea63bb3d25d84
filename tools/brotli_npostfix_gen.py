#!/usr/bin/env python3
"""Extend the brotli golden corpus with streams that exercise the
NPOSTFIX/NDIRECT distance scheme (RFC 7932 §4's postfix/direct distance
codes). The one-shot BrotliEncoderCompress almost never emits nonzero
NPOSTFIX on ordinary data, so that decoder path would otherwise ride on
spec-reading alone; the STREAMING encoder API exposes the knobs
(BROTLI_PARAM_NPOSTFIX=7, BROTLI_PARAM_NDIRECT=8 in encode.h), and the
resulting streams are still real libbrotli output, C-round-trip-verified
before committing.

Valid combos per the format: npostfix 0..3, ndirect a multiple of
1 << npostfix, ndirect <= 120.  Also adds a large-window w24 stream of
back-reference-heavy data and an lgblock-forced multi-meta-block stream.
"""
import ctypes, os, struct, random

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STREAMS = os.path.join(ROOT, "src/test/resources/golden/brotli_streams")

enc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlienc.so.1")
dec = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1")

enc.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
enc.BrotliEncoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
enc.BrotliEncoderSetParameter.restype = ctypes.c_int
enc.BrotliEncoderSetParameter.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
enc.BrotliEncoderCompressStream.restype = ctypes.c_int
enc.BrotliEncoderCompressStream.argtypes = [
    ctypes.c_void_p, ctypes.c_int,
    ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
    ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
    ctypes.POINTER(ctypes.c_size_t)]
enc.BrotliEncoderIsFinished.restype = ctypes.c_int
enc.BrotliEncoderIsFinished.argtypes = [ctypes.c_void_p]
enc.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]

MODE, QUALITY, LGWIN, LGBLOCK, NPOSTFIX, NDIRECT = 0, 1, 2, 3, 7, 8
PROCESS, FINISH = 0, 2


def stream_encode(data: bytes, params: dict) -> bytes:
    st = enc.BrotliEncoderCreateInstance(None, None, None)
    assert st
    try:
        for p, v in params.items():
            assert enc.BrotliEncoderSetParameter(st, p, v) == 1, (p, v)
        out = bytearray()
        in_buf = ctypes.c_char_p(data)
        avail_in = ctypes.c_size_t(len(data))
        chunk = ctypes.create_string_buffer(1 << 16)
        while True:
            next_out = ctypes.cast(chunk, ctypes.c_char_p)
            avail_out = ctypes.c_size_t(len(chunk))
            ok = enc.BrotliEncoderCompressStream(
                st, FINISH, ctypes.byref(avail_in), ctypes.byref(in_buf),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            assert ok == 1
            out += chunk.raw[: len(chunk) - avail_out.value]
            if enc.BrotliEncoderIsFinished(st):
                break
        comp = bytes(out)
    finally:
        enc.BrotliEncoderDestroyInstance(st)
    back_len = ctypes.c_size_t(len(data) + 16)
    back = ctypes.create_string_buffer(max(back_len.value, 16))
    assert dec.BrotliDecoderDecompress(len(comp), comp, ctypes.byref(back_len), back) == 1
    assert back.raw[: back_len.value] == data
    return comp


rng = random.Random(7)
# back-reference-heavy data with distances spread across many magnitudes,
# so direct + postfix-coded distances both fire
pieces = []
base = bytes(rng.randrange(256) for _ in range(4096))
pieces.append(base)
for _ in range(400):
    off = rng.randrange(0, sum(len(p) for p in pieces) - 64)
    ln = rng.randrange(8, 64)
    whole = b"".join(pieces)
    pieces = [whole, whole[off : off + ln]]
back_heavy = b"".join(pieces)[:120000]

text = (b"distance scheme exercise: the postfix and direct codes " * 600)

idx = 71  # continue numbering after the base corpus
manifest = []
for name, data, extra in [
    ("npostfix", back_heavy, None),
    ("npostfix_text", text, None),
]:
    for npostfix in (1, 2, 3):
        for ndirect_units in (0, 5, 15):
            ndirect = ndirect_units << npostfix
            params = {QUALITY: 9 if name == "npostfix" else 11, LGWIN: 22,
                      NPOSTFIX: npostfix, NDIRECT: ndirect}
            comp = stream_encode(data, params)
            base_name = f"{idx:03d}_{name}_p{npostfix}_d{ndirect}"
            with open(os.path.join(STREAMS, base_name + ".raw"), "wb") as f:
                f.write(data)
            with open(os.path.join(STREAMS, base_name + ".br"), "wb") as f:
                f.write(comp)
            manifest.append((base_name, len(data), len(comp)))
            idx += 1
# lgblock-forced small meta-blocks (many compressed meta-blocks per stream)
comp = stream_encode(back_heavy, {QUALITY: 9, LGWIN: 18, LGBLOCK: 16})
base_name = f"{idx:03d}_lgblock16_q9_w18"
with open(os.path.join(STREAMS, base_name + ".raw"), "wb") as f:
    f.write(back_heavy)
with open(os.path.join(STREAMS, base_name + ".br"), "wb") as f:
    f.write(comp)
manifest.append((base_name, len(back_heavy), len(comp)))
idx += 1

with open(os.path.join(STREAMS, "MANIFEST.tsv"), "a") as f:
    for base_name, rl, cl in manifest:
        f.write(f"{base_name}\t{rl}\t{cl}\n")
print("added:", len(manifest), "streams;", [m[0] for m in manifest[:4]], "...")
