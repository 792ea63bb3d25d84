#!/usr/bin/env python3
"""Incremental probe of the Draco bitstream (v2.2) on the reference's
committed draco mesh fixtures. Public-spec-driven reimplementation
(https://google.github.io/draco/spec/); no draco code available or used.
Grows into the golden-oracle generator for the Scala decoder.
"""
import glob, struct, sys

class Buf:
    def __init__(self, data, pos=0):
        self.d = data
        self.p = pos
    def u8(self):
        v = self.d[self.p]; self.p += 1; return v
    def i8(self):
        v = struct.unpack_from('<b', self.d, self.p)[0]; self.p += 1; return v
    def u16(self):
        v = struct.unpack_from('<H', self.d, self.p)[0]; self.p += 2; return v
    def u32(self):
        v = struct.unpack_from('<I', self.d, self.p)[0]; self.p += 4; return v
    def f32(self):
        v = struct.unpack_from('<f', self.d, self.p)[0]; self.p += 4; return v
    def f64(self):
        v = struct.unpack_from('<d', self.d, self.p)[0]; self.p += 8; return v
    def raw(self, n):
        v = self.d[self.p:self.p+n]; self.p += n; return v
    def varint(self):
        out = 0; shift = 0
        while True:
            b = self.u8()
            out |= (b & 0x7F) << shift
            if not (b & 0x80): return out
            shift += 7
    def remaining(self):
        return len(self.d) - self.p

def parse_metadata_entries(b):
    n = b.varint()
    out = {}
    for _ in range(n):
        klen = b.u8(); key = b.raw(klen).decode()
        vlen = b.u8(); val = b.raw(vlen)
        out[key] = val
    nsub = b.varint()
    assert nsub == 0, f"sub metadata {nsub}"
    return out

def probe(path):
    data = open(path, 'rb').read()
    b = Buf(data)
    magic = b.raw(5)
    assert magic == b'DRACO', magic
    major, minor = b.u8(), b.u8()
    enc_type = b.u8()       # 1 = TRIANGULAR_MESH
    method = b.u8()         # 1 = MESH_EDGEBREAKER_ENCODING
    flags = b.u16()
    meta = {}
    if flags & 0x8000:
        num_att_md = b.varint()
        assert num_att_md == 0, num_att_md
        meta = parse_metadata_entries(b)
    qb = struct.unpack('<i', meta['quantization_bits'])[0] if 'quantization_bits' in meta else None
    qrange = struct.unpack('<d', meta['quantization_range'])[0] if 'quantization_range' in meta else None
    qorigin = struct.unpack('<3d', meta['quantization_origin']) if 'quantization_origin' in meta else None
    # connectivity preamble
    traversal_type = b.u8()  # 0=standard 1=predictive 2=valence
    num_encoded_vertices = b.varint()
    num_faces = b.varint()
    num_attribute_data = b.u8()
    num_encoded_symbols = b.varint()
    num_encoded_split_symbols = b.varint()
    print(f"{path.split('/')[-1][:40]:42s} v{major}.{minor} trav={traversal_type} "
          f"nv={num_encoded_vertices} nf={num_faces} natt={num_attribute_data} "
          f"nsym={num_encoded_symbols} nsplit={num_encoded_split_symbols} "
          f"qb={qb} qrange={qrange:.1f} qorig={qorigin} rem={b.remaining()}")

if __name__ == '__main__':
    files = sorted(glob.glob('/root/reference/test/test_cv/mesh_mip_2_draco_sv16/*:0:*'))
    for f in files:
        probe(f)
