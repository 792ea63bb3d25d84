"""Generator for the f2_mmh3 oracle VALUES table: an independent
pure-Python murmurhash3_x86_128 (public algorithm, Austin Appleby's
reference layout), validated against the reference test suite's
canonical sharding vector (test/test_sharding.py:34-51) before
emitting rows. Shard numbers print as decimal ints (the reference
asserts the hex string '42' = 66).
"""
import struct
M = 0xffffffff
def rotl(x, r): return ((x << r) | (x >> (32 - r))) & M
def fmix(h):
    h ^= h >> 16; h = (h * 0x85ebca6b) & M
    h ^= h >> 13; h = (h * 0xc2b2ae35) & M
    h ^= h >> 16
    return h
def mmh3_x86_128_low64(data, seed=0):
    c1, c2, c3, c4 = 0x239b961b, 0xab0e9789, 0x38b34ae5, 0xa1e38b93
    h1 = h2 = h3 = h4 = seed
    n = len(data); nblocks = n // 16
    for i in range(nblocks):
        k1, k2, k3, k4 = struct.unpack_from('<4I', data, i * 16)
        k1 = (k1*c1)&M; k1 = rotl(k1,15); k1 = (k1*c2)&M; h1 ^= k1
        h1 = rotl(h1,19); h1 = (h1+h2)&M; h1 = (h1*5+0x561ccd1b)&M
        k2 = (k2*c2)&M; k2 = rotl(k2,16); k2 = (k2*c3)&M; h2 ^= k2
        h2 = rotl(h2,17); h2 = (h2+h3)&M; h2 = (h2*5+0x0bcaa747)&M
        k3 = (k3*c3)&M; k3 = rotl(k3,17); k3 = (k3*c4)&M; h3 ^= k3
        h3 = rotl(h3,15); h3 = (h3+h4)&M; h3 = (h3*5+0x96cd1c35)&M
        k4 = (k4*c4)&M; k4 = rotl(k4,18); k4 = (k4*c1)&M; h4 ^= k4
        h4 = rotl(h4,13); h4 = (h4+h1)&M; h4 = (h4*5+0x32ac3b17)&M
    tail = data[nblocks*16:]
    k1 = k2 = k3 = k4 = 0
    t = len(tail)
    if t >= 15: k4 ^= tail[14] << 16
    if t >= 14: k4 ^= tail[13] << 8
    if t >= 13:
        k4 ^= tail[12]
        k4 = (k4*c4)&M; k4 = rotl(k4,18); k4 = (k4*c1)&M; h4 ^= k4
    if t >= 12: k3 ^= tail[11] << 24
    if t >= 11: k3 ^= tail[10] << 16
    if t >= 10: k3 ^= tail[9] << 8
    if t >= 9:
        k3 ^= tail[8]
        k3 = (k3*c3)&M; k3 = rotl(k3,17); k3 = (k3*c4)&M; h3 ^= k3
    if t >= 8: k2 ^= tail[7] << 24
    if t >= 7: k2 ^= tail[6] << 16
    if t >= 6: k2 ^= tail[5] << 8
    if t >= 5:
        k2 ^= tail[4]
        k2 = (k2*c2)&M; k2 = rotl(k2,16); k2 = (k2*c3)&M; h2 ^= k2
    if t >= 4: k1 ^= tail[3] << 24
    if t >= 3: k1 ^= tail[2] << 16
    if t >= 2: k1 ^= tail[1] << 8
    if t >= 1:
        k1 ^= tail[0]
        k1 = (k1*c1)&M; k1 = rotl(k1,15); k1 = (k1*c2)&M; h1 ^= k1
    h1 ^= n; h2 ^= n; h3 ^= n; h4 ^= n
    h1 = (h1+h2+h3+h4)&M; h2 = (h2+h1)&M; h3 = (h3+h1)&M; h4 = (h4+h1)&M
    h1, h2, h3, h4 = fmix(h1), fmix(h2), fmix(h3), fmix(h4)
    h1 = (h1+h2+h3+h4)&M; h2 = (h2+h1)&M; h3 = (h3+h1)&M; h4 = (h4+h1)&M
    return h1 | (h2 << 32)  # hash64[0] as uint64

def loc(label, pre, msb, sb):
    chunkid = mmh3_x86_128_low64(struct.pack('<Q', label >> pre))
    mini = chunkid & ((1 << msb) - 1)
    shard = (chunkid & (((1 << (msb + sb)) - 1) ^ ((1 << msb) - 1))) >> msb
    return chunkid, shard, mini

# canonical vector from the reference test suite: the reference prints
# the shard as a HEX string ('42' = 0x42 = 66 decimal) and the
# minishard in decimal (18). Hard-fail generation on any hash drift —
# a print-only check would keep emitting wrong rows.
cid, sh, ms = loc(1822975381, 6, 11, 7)
assert sh == 0x42 and ms == 18, \
    f"mmh3 drift: got shard={sh} mini={ms}, want shard=0x42(=66) mini=18"
print(f"# canonical: shard={sh} (hex {sh:#x}, reference prints '42') mini={ms}")
def tosigned(u): return u - (1 << 64) if u >= (1 << 63) else u
labels = [1822975381] + [(k * 2654435761) % (1 << 40) for k in range(1, 16)]
for l in labels:
    cid, sh, ms = loc(l, 6, 11, 7)
    print(f"({l}, {tosigned(cid)}, {sh}, {ms}),")

