#!/usr/bin/env python3
"""Cross-validate the Scala entropy ENCODER (core/Brotli.compress) against
the reference C decoder: decode every stream dumped by
`sbt "Test/runMain graft.BrotliEncodeDump"` with libbrotlidec 1.0.9 and
assert byte equality with its raw twin. This is the encoder-side mirror
of BrotliSpec's decoder golden parity — together they pin both
directions against the reference implementation.

Run: sbt "Test/runMain graft.BrotliEncodeDump" && python3 tools/brotli_encoder_check.py
"""
import ctypes, glob, os, sys

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/brotli_enc_check"
dec = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1")
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]

pairs = sorted(glob.glob(os.path.join(DIR, "*.br")))
assert pairs, f"no .br files in {DIR} — run BrotliEncodeDump first"
n_ok = 0
total_raw = total_br = 0
for brp in pairs:
    raw = open(brp[:-3] + ".raw", "rb").read()
    br = open(brp, "rb").read()
    out_len = ctypes.c_size_t(len(raw) + 16)
    out = ctypes.create_string_buffer(max(out_len.value, 16))
    ok = dec.BrotliDecoderDecompress(len(br), br, ctypes.byref(out_len), out)
    assert ok == 1, f"C decoder REJECTED {os.path.basename(brp)}"
    assert out.raw[: out_len.value] == raw, f"C decode MISMATCH {os.path.basename(brp)}"
    n_ok += 1
    total_raw += len(raw)
    total_br += len(br)
print(f"{n_ok} streams C-decode byte-identically; "
      f"{total_raw} raw -> {total_br} encoded ({total_br / max(total_raw,1):.3f})")
print("OK")
