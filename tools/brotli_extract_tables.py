#!/usr/bin/env python3
"""Extract the RFC 7932 (brotli) static tables from the system's public
libbrotli 1.0.9 shared libraries via their PUBLIC C API, and write them
as committed fixtures for the Scala decoder:

  src/main/resources/graft/brotli/brotli_dictionary.bin  (122,784 B, RFC App. A)
  src/main/resources/graft/brotli/brotli_transforms.tsv  (121 rows)
  src/main/resources/graft/brotli/brotli_context_lut.bin (2,048 B, RFC 7.1 LUTs)

Why extraction instead of hand-typing: the dictionary is a 122 KB binary
appendix of RFC 7932 — unobtainable as text offline — and the transform
table / context LUTs are exactly the kind of data where a single typo
produces a decoder that fails only on rare inputs.  libbrotlicommon
exports them through its public API (BrotliGetDictionary,
BrotliGetTransforms, BrotliTransformDictionaryWord, and the
_kBrotliContextLookupTable data symbol), so we read them from the
installed library and sanity-check structure against the RFC's published
invariants (bucket sizes, total length, 121 transforms, known words).

The transform table is recovered behaviourally, not by struct-poking:
we call BrotliTransformDictionaryWord on a probe word whose characters
are all distinct, and parse prefix / ferment-op / suffix out of the
result.  That keeps us independent of the BrotliTransforms struct layout.

Also generates golden (raw, compressed) stream pairs with the REAL C
encoder (libbrotlienc) across qualities 0..11, window sizes, and input
shapes (text / dictionary-heavy / binary segmentation-like / random /
empty / tiny), as brotli_streams/NNN_<desc>.{raw,br} — the Scala
decoder's byte-parity fixtures.
"""
import ctypes, hashlib, os, struct, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/main/resources/graft/brotli")  # runtime tables
GOLD = os.path.join(ROOT, "src/test/resources/golden")       # test fixtures
STREAMS = os.path.join(GOLD, "brotli_streams")
os.makedirs(OUT, exist_ok=True)

common = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1")
enc = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlienc.so.1")
dec = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1")

# ---------------------------------------------------------------- dictionary
# struct BrotliDictionary (common/dictionary.h, brotli 1.0.9):
#   uint8_t  size_bits_by_length[32];
#   uint32_t offsets_by_length[32];
#   size_t   data_size;
#   const uint8_t* data;
common.BrotliGetDictionary.restype = ctypes.c_void_p
dict_ptr = common.BrotliGetDictionary()
raw = ctypes.string_at(dict_ptr, 32 + 32 * 4 + 8 + 8)
size_bits = list(raw[0:32])
offsets = struct.unpack("<32I", raw[32 : 32 + 128])
data_size, data_addr = struct.unpack("<QQ", raw[160:176])
assert data_size == 122784, f"unexpected dictionary size {data_size}"
# RFC 7932 Appendix A invariants: words of length 4..24, NWORDS = 1<<bits
assert size_bits[:4] == [0, 0, 0, 0]
total = 0
for ln in range(4, 25):
    nwords = 1 << size_bits[ln]
    assert offsets[ln] == total, (ln, offsets[ln], total)
    total += ln * nwords
assert total == data_size, (total, data_size)
dictionary = ctypes.string_at(data_addr, data_size)
# content spot-checks: known common-word content
assert b"time" in dictionary and b"ation" in dictionary
with open(os.path.join(OUT, "brotli_dictionary.bin"), "wb") as f:
    f.write(dictionary)
print("dictionary.bin", data_size, "sha256", hashlib.sha256(dictionary).hexdigest())
print("size_bits_by_length[4..24] =", size_bits[4:25])

# ---------------------------------------------------------------- transforms
# Recover the 121 (prefix, op, suffix) rows behaviourally through
# BrotliTransformDictionaryWord.  Ops per RFC 7932 §8:
#   Identity | OmitFirst1..9 | OmitLast1..9 | FermentFirst | FermentAll
common.BrotliGetTransforms.restype = ctypes.c_void_p
transforms_ptr = common.BrotliGetTransforms()
# struct BrotliTransforms (common/transform.h, 1.0.9): uint16 prefix_suffix_size;
# pad; const uint8_t* prefix_suffix (@8); const uint16_t* prefix_suffix_map (@16);
# uint32 num_transforms (@24).  The probe below must stop at num_transforms —
# BrotliTransformDictionaryWord does not bounds-check its index.
num_transforms = struct.unpack("<I", ctypes.string_at(transforms_ptr + 24, 4))[0]
assert num_transforms == 121, num_transforms
common.BrotliTransformDictionaryWord.restype = ctypes.c_int
common.BrotliTransformDictionaryWord.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]

PROBE = b"abcdefghijklmnopqrst"   # 20 distinct lowercase ASCII chars
PROBE2 = b"zyxwvutsrqponmlkjihg"  # reversed alphabet — disambiguates Ferment
                                  # ops from literal prefixes/suffixes: a
                                  # FermentFirst result starts with the
                                  # uppercased first PROBE char ("A"/"Z"),
                                  # which a fixed literal prefix cannot
                                  # reproduce on both probes.


def apply_op(word: bytes, op: str) -> bytes:
    if op == "Identity":
        return word
    if op.startswith("OmitFirst"):
        n = int(op[9:])
        return word[n:] if n < len(word) else b""
    if op.startswith("OmitLast"):
        n = int(op[8:])
        return word[:-n] if n < len(word) else b""
    if op == "FermentFirst":  # uppercase-first for ASCII probe
        return word[:1].upper() + word[1:]
    if op == "FermentAll":
        return word.upper()
    raise AssertionError(op)


OPS = (["Identity"] + [f"OmitFirst{i}" for i in range(1, 10)]
       + [f"OmitLast{i}" for i in range(1, 10)] + ["FermentFirst", "FermentAll"])

def tf(word: bytes, i: int) -> bytes:
    buf = ctypes.create_string_buffer(128)
    n = common.BrotliTransformDictionaryWord(buf, word, len(word), transforms_ptr, i)
    return buf.raw[:n]


rows = []
for i in range(num_transforms):
    out1, out2 = tf(PROBE, i), tf(PROBE2, i)
    matched = None
    for op in OPS:  # an op matches only if it explains BOTH probes with
        core1, core2 = apply_op(PROBE, op), apply_op(PROBE2, op)  # the SAME
        p1, p2 = out1.find(core1), out2.find(core2)               # prefix/suffix
        if core1 and p1 >= 0 and p2 >= 0:
            pre1, suf1 = out1[:p1], out1[p1 + len(core1):]
            pre2, suf2 = out2[:p2], out2[p2 + len(core2):]
            if pre1 == pre2 and suf1 == suf2:
                matched = (pre1, op, suf1)
                break
    assert matched, (i, out1, out2)
    rows.append(matched)
assert len(rows) == 121, len(rows)
assert rows[0] == (b"", "Identity", b""), rows[0]


def esc(b: bytes) -> str:
    return "".join(f"\\x{c:02x}" if c in (0x5c, 0x09, 0x0a, 0x0d) or c < 0x20 or c > 0x7e
                   else chr(c) for c in b)

with open(os.path.join(OUT, "brotli_transforms.tsv"), "w") as f:
    for prefix, op, suffix in rows:
        f.write(f"{esc(prefix)}\t{op}\t{esc(suffix)}\n")
print("transforms.tsv", len(rows), "rows")

# Golden transform outputs on REAL dictionary words (tests the Scala
# ferment ops incl. the UTF-8-aware uppercase on multi-byte sequences).
golden_tf = []
for ln in (4, 8, 12, 18, 24):
    nwords = 1 << size_bits[ln]
    for widx in (0, 1, nwords // 2, nwords - 1):
        off = offsets[ln] + widx * ln
        word = dictionary[off : off + ln]
        for tid in (0, 3, 9, 12, 25, 44, 62, 85, 120):
            buf = ctypes.create_string_buffer(64)
            n = common.BrotliTransformDictionaryWord(buf, word, ln, transforms_ptr, tid)
            golden_tf.append((ln, widx, tid, buf.raw[:n]))
with open(os.path.join(GOLD, "brotli_transform_golden.tsv"), "w") as f:
    for ln, widx, tid, out in golden_tf:
        f.write(f"{ln}\t{widx}\t{tid}\t{esc(out)}\n")
print("transform_golden.tsv", len(golden_tf), "rows")

# ---------------------------------------------------------------- context LUT
lut = ctypes.string_at(ctypes.addressof(ctypes.c_char.in_dll(common, "_kBrotliContextLookupTable")), 2048)
# RFC §7.1: four modes x (LUT0 | LUT1), 256 bytes each.  LSB6 mode:
# LUT0[b] = b & 0x3f, LUT1[b] = 0 — verify to prove we grabbed the right symbol.
lsb6_lut0 = lut[0:256]      # mode order in library: LSB6, MSB6, UTF8, Signed
found = None
for base in range(0, 2048 - 512 + 1, 256):
    if all(lut[base + b] == (b & 0x3F) for b in range(256)) and all(
            lut[base + 256 + b] == 0 for b in range(256)):
        found = base
        break
assert found is not None, "LSB6 block not found in context LUT"
with open(os.path.join(OUT, "brotli_context_lut.bin"), "wb") as f:
    f.write(lut)
print("context_lut.bin 2048 bytes; LSB6 block at offset", found)

# ---------------------------------------------------------------- golden streams
os.makedirs(STREAMS, exist_ok=True)
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]


def brotli_c(data: bytes, q: int, lgwin: int, mode: int) -> bytes:
    out_len = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    out = ctypes.create_string_buffer(out_len.value)
    ok = enc.BrotliEncoderCompress(q, lgwin, mode, len(data), data, ctypes.byref(out_len), out)
    assert ok == 1
    comp = out.raw[: out_len.value]
    # independent C round-trip before committing
    back_len = ctypes.c_size_t(len(data) + 16)
    back = ctypes.create_string_buffer(max(back_len.value, 16))
    ok2 = dec.BrotliDecoderDecompress(len(comp), comp, ctypes.byref(back_len), back)
    assert ok2 == 1 and back.raw[: back_len.value] == data
    return comp


import random
rng = random.Random(42)

text = (b"The quick brown fox jumps over the lazy dog. " * 40
        + b"Information about the description of the development "
          b"of the International Association for the private sector. " * 20)
dict_heavy = b" ".join(dictionary[offsets[8] + 8 * k : offsets[8] + 8 * (k + 1)]
                       for k in range(0, 400, 3))
seg = bytes()
segl = []
label = 7
for _ in range(30000):
    if rng.random() < 0.02:
        label = rng.randrange(1, 2 ** 20)
    segl.append(label)
seg = b"".join(struct.pack("<I", v) for v in segl)   # uint32 run-heavy, like cseg input
rand = bytes(rng.randrange(256) for _ in range(20000))
utf8 = ("Zürich ångström née — κόσμος мир 世界 " * 300).encode("utf-8")
repeats = (b"ABCD" * 7 + b"\x00" * 9) * 700

cases = []
for name, data in [("empty", b""), ("one", b"Q"), ("tiny", b"hello hello hello"),
                   ("text", text), ("dictheavy", dict_heavy), ("utf8", utf8),
                   ("seg_u32", seg), ("random", rand), ("repeats", repeats)]:
    for q in (0, 1, 2, 4, 5, 9, 11):
        for lgwin in ((10, 18, 22, 24) if name == "text" and q in (5, 11) else (22,)):
            cases.append((name, data, q, lgwin, 0))
# FONT/TEXT modes at one quality for coverage of mode-specific emissions
cases.append(("text_mode", text, 9, 22, 1))
cases.append(("font_mode", rand, 9, 22, 2))

idx = 0
manifest = []
for name, data, q, lgwin, mode in cases:
    comp = brotli_c(data, q, lgwin, mode)
    base = f"{idx:03d}_{name}_q{q}_w{lgwin}_m{mode}"
    with open(os.path.join(STREAMS, base + ".raw"), "wb") as f:
        f.write(data)
    with open(os.path.join(STREAMS, base + ".br"), "wb") as f:
        f.write(comp)
    manifest.append((base, len(data), len(comp)))
    idx += 1
with open(os.path.join(STREAMS, "MANIFEST.tsv"), "w") as f:
    for base, rl, cl in manifest:
        f.write(f"{base}\t{rl}\t{cl}\n")
print("streams:", len(manifest), "total br bytes:", sum(c for _, _, c in manifest))
print("OK")
