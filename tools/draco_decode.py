#!/usr/bin/env python3
"""Pure-python Draco bitstream v2.2 decoder for the subset the reference's
fixtures exercise: triangular mesh, MESH_EDGEBREAKER_ENCODING with the
STANDARD traversal, single POSITION float32 attribute, sequential
quantization coding with parallelogram prediction + wrap transform.

Re-derived from the public Draco bitstream specification
(https://google.github.io/draco/spec/). Orientation conventions that the
spec leaves easy to mix up (left/right gluing, split-edge side, DFS branch
order) are exposed as knobs and locked empirically against the reference's
own committed fixtures: mesh_mip_2_err_40_sv16 holds the same fragment
geometry uncompressed, giving a position-level golden.

This doubles as the golden-oracle generator for the Scala port
(core/Draco.scala), the same pattern as compresso_oracle_gen.py.
"""
import struct

INVALID = -1
TOP_C, TOP_S, TOP_L, TOP_R, TOP_E = 0, 1, 3, 5, 7


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

    def i32(self):
        v = struct.unpack_from('<i', self.d, self.p)[0]; self.p += 4; return v

    def f32(self):
        v = struct.unpack_from('<f', self.d, self.p)[0]; self.p += 4; return v

    def raw(self, n):
        v = self.d[self.p:self.p + n]; self.p += n; return v

    def varint(self):
        out = 0; shift = 0
        while True:
            b = self.u8()
            out |= (b & 0x7F) << shift
            if not (b & 0x80):
                return out
            shift += 7

    def remaining(self):
        return len(self.d) - self.p


class Bits:
    """LSB-first bit reader over a byte slice."""
    def __init__(self, data):
        self.d = data
        self.off = 0

    def bit(self):
        byte = self.d[self.off >> 3]
        v = (byte >> (self.off & 7)) & 1
        self.off += 1
        return v

    def bits(self, n):
        out = 0
        for i in range(n):
            out |= self.bit() << i
        return out


class RAnsBitDecoder:
    """Binary rANS decoder (draco RAnsBitDecoder): prob_zero u8 + varint
    byte count + rANS-coded bytes; l_base=4096, io_base=256."""
    L_BASE = 4096
    IO_BASE = 256

    def __init__(self, b: Buf):
        self.prob_zero = b.u8()
        nbytes = b.varint()
        buf = b.raw(nbytes)
        self.buf = buf
        if nbytes < 1:
            raise ValueError("empty rans bit stream")
        x = buf[-1] >> 6
        if x == 0:
            self.off = nbytes - 1
            self.state = buf[-1] & 0x3F
        elif x == 1:
            self.off = nbytes - 2
            self.state = struct.unpack_from('<H', buf, nbytes - 2)[0] & 0x3FFF
        elif x == 2:
            self.off = nbytes - 3
            self.state = (buf[nbytes-3] | buf[nbytes-2] << 8 | buf[nbytes-1] << 16) & 0x3FFFFF
        else:
            raise ValueError("bad rans bit init")
        self.state += self.L_BASE
        if self.state >= self.L_BASE * self.IO_BASE:
            raise ValueError("bad rans bit state")

    def decode_bit(self):
        p0 = self.prob_zero
        p = 256 - p0
        if self.state < self.L_BASE and self.off > 0:
            self.off -= 1
            self.state = self.state * self.IO_BASE + self.buf[self.off]
        x = self.state
        quot, rem = divmod(x, 256)
        xn = quot * p
        val = rem < p
        if val:
            self.state = xn + rem
        else:
            self.state = x - xn - p
        return 1 if val else 0


class RAnsSymbolDecoder:
    """Multi-symbol rANS decoder (draco RAnsSymbolDecoder): explicit
    probability table + rANS stream; precision = clamp(3L/2, 12, 20)."""
    IO_BASE = 256

    def __init__(self, b: Buf, unique_symbols_bit_length):
        prec_bits = (3 * unique_symbols_bit_length) // 2
        prec_bits = max(12, min(20, prec_bits))
        self.precision = 1 << prec_bits
        self.l_base = self.precision * 4
        num_symbols = b.varint()
        probs = [0] * num_symbols
        i = 0
        while i < num_symbols:
            pb = b.u8()
            token = pb & 3
            if token == 3:
                run = (pb >> 2) + 1
                if i + run > num_symbols:
                    raise ValueError("prob zero-run overflow")
                i += run
            else:
                prob = pb >> 2
                for eb in range(token):
                    prob |= b.u8() << (6 + 8 * eb)
                probs[i] = prob
                i += 1
        if num_symbols > 0 and sum(probs) != self.precision:
            raise ValueError(f"prob table sums to {sum(probs)} != {self.precision}")
        # cumulative + reverse lookup
        self.probs = probs
        self.cum = [0] * num_symbols
        c = 0
        self.lut = [0] * self.precision
        for s, p in enumerate(probs):
            self.cum[s] = c
            for j in range(p):
                self.lut[c + j] = s
            c += p
        # rANS stream
        nbytes = b.varint()
        buf = b.raw(nbytes)
        self.buf = buf
        if nbytes < 1:
            raise ValueError("empty rans stream")
        x = buf[-1] >> 6
        if x == 0:
            self.off = nbytes - 1
            self.state = buf[-1] & 0x3F
        elif x == 1:
            self.off = nbytes - 2
            self.state = struct.unpack_from('<H', buf, nbytes - 2)[0] & 0x3FFF
        elif x == 2:
            self.off = nbytes - 3
            self.state = (buf[nbytes-3] | buf[nbytes-2] << 8 | buf[nbytes-1] << 16) & 0x3FFFFF
        else:
            self.off = nbytes - 4
            self.state = struct.unpack_from('<I', buf, nbytes - 4)[0] & 0x3FFFFFFF
        self.state += self.l_base
        if self.state >= self.l_base * self.IO_BASE:
            raise ValueError("bad rans state")

    def decode(self):
        while self.state < self.l_base and self.off > 0:
            self.off -= 1
            self.state = self.state * self.IO_BASE + self.buf[self.off]
        quot, rem = divmod(self.state, self.precision)
        s = self.lut[rem]
        self.state = quot * self.probs[s] + rem - self.cum[s]
        return s


def decode_symbols(b: Buf, num_values, num_components):
    """draco::DecodeSymbols — tagged or raw scheme."""
    if num_values == 0:
        return []
    scheme = b.u8()
    out = [0] * num_values
    if scheme == 0:  # TAGGED
        tag_dec = RAnsSymbolDecoder(b, 5)
        bits = Bits(b.d[b.p:])  # StartBitDecoding(decode_size=False)
        pos = 0
        for _ in range(0, num_values, num_components):
            blen = tag_dec.decode()
            for _c in range(num_components):
                out[pos] = bits.bits(blen)
                pos += 1
        b.p += (bits.off + 7) // 8
        return out
    elif scheme == 1:  # RAW
        max_bit_length = b.u8()
        dec = RAnsSymbolDecoder(b, max_bit_length)
        for i in range(num_values):
            out[i] = dec.decode()
        return out
    raise ValueError(f"unknown symbol scheme {scheme}")


def zigzag(v):
    return (v >> 1) ^ -(v & 1)


# Convention knobs, locked by tools/draco_lock_conventions.py against the
# committed fixtures. Defaults = best-recollection of the draco source.
DEFAULT_KNOBS = dict(
    r_glue_plus=2,      # R glues active corner to new corner+2 (L mirrors with +1)
    split_right_next=1, # split source edge RIGHT saves Next(corner) (else Prev)
    right_is_opp_next=0,  # GetRightCorner(c) = Opposite(Previous(c))
    dfs_right_first=1,  # DFS continues on right branch, stacks left
)


class EdgebreakerMesh:
    """Decoded topology: faces as corner->vertex, opposite links."""
    def __init__(self):
        self.opp = []          # corner -> corner | INVALID
        self.cvert = []        # corner -> vertex id (pre-merge)
        self.parent = []       # vertex union-find

    def add_face(self):
        f = len(self.opp) // 3
        self.opp.extend((INVALID, INVALID, INVALID))
        self.cvert.extend((INVALID, INVALID, INVALID))
        return 3 * f

    def new_vertex(self):
        v = len(self.parent)
        self.parent.append(v)
        return v

    def find(self, v):
        while self.parent[v] != v:
            self.parent[v] = self.parent[self.parent[v]]
            v = self.parent[v]
        return v

    def merge(self, keep, kill):
        self.parent[self.find(kill)] = self.find(keep)

    def vert(self, c):
        return self.find(self.cvert[c])

    @staticmethod
    def nxt(c):
        return c - 2 if c % 3 == 2 else c + 1

    @staticmethod
    def prv(c):
        return c + 2 if c % 3 == 0 else c - 1

    def swing_left(self, c):
        o = self.opp[self.nxt(c)]
        return INVALID if o == INVALID else self.nxt(o)

    def swing_right(self, c):
        o = self.opp[self.prv(c)]
        return INVALID if o == INVALID else self.prv(o)

    def leftmost(self, c):
        """Walk swing_left from corner c until boundary or full loop."""
        start = c
        guard = len(self.opp) + 3
        while True:
            n = self.swing_left(c)
            if n == INVALID:
                return c
            if n == start:
                return start  # interior vertex: any corner works
            c = n
            guard -= 1
            if guard <= 0:
                raise ValueError("leftmost walk does not terminate")

    def is_boundary_vertex(self, c):
        start = c
        guard = len(self.opp) + 3
        while True:
            n = self.swing_left(c)
            if n == INVALID:
                return True
            if n == start:
                return False
            c = n
            guard -= 1
            if guard <= 0:
                raise ValueError("boundary walk does not terminate")

    def set_opp(self, a, b):
        self.opp[a] = b
        self.opp[b] = a


def decode_connectivity(mesh, bits, start_face_dec, num_symbols, splits, knobs):
    """Edgebreaker symbol replay. splits: dict decoder_symbol_id ->
    (decoder_source_id, source_edge). Returns processed corner list."""
    K = knobs
    stack = []
    split_corners = {}  # decoder S symbol id -> saved corner
    # invert: source decoder id -> list of (split decoder id, edge)
    by_source = {}
    for split_id, (source_id, edge) in splits.items():
        by_source.setdefault(source_id, []).append((split_id, edge))
    processed = []
    vcorner = {}  # vertex -> a live corner (for leftmost walks)

    def track(c):
        vcorner[mesh.vert(c)] = c

    for sid in range(num_symbols):
        bit0 = bits.bit()
        sym = TOP_C if bit0 == 0 else (1 | (bits.bits(2) << 1))
        corner = mesh.add_face()
        if sym == TOP_C:
            if not stack:
                raise ValueError("C on empty stack")
            ca = stack[-1]
            vx = mesh.vert(mesh.nxt(ca))
            lmc = mesh.leftmost(vcorner[vx])
            if mesh.vert(lmc) != vx:
                raise ValueError("stale vertex corner")
            cb = mesh.nxt(lmc)
            if ca == cb:
                raise ValueError("degenerate C")
            mesh.set_opp(ca, corner + 1)
            mesh.set_opp(cb, corner + 2)
            mesh.cvert[corner] = vx
            mesh.cvert[corner + 1] = mesh.vert(mesh.prv(lmc))
            mesh.cvert[corner + 2] = mesh.vert(mesh.prv(ca))
            track(corner); track(corner + 1); track(corner + 2)
            stack[-1] = corner
        elif sym == TOP_R or sym == TOP_L:
            if not stack:
                raise ValueError("R/L on empty stack")
            ca = stack[-1]
            plus = K['r_glue_plus'] if sym == TOP_R else (3 - K['r_glue_plus'])
            mesh.set_opp(ca, corner + plus)
            nv = mesh.new_vertex()
            if plus == 2:
                # shared edge = (corner, corner+1)
                mesh.cvert[corner] = mesh.vert(mesh.prv(ca))
                mesh.cvert[corner + 1] = mesh.vert(mesh.nxt(ca))
                mesh.cvert[corner + 2] = nv
            else:
                # shared edge = (corner+2, corner)
                mesh.cvert[corner] = mesh.vert(mesh.nxt(ca))
                mesh.cvert[corner + 2] = mesh.vert(mesh.prv(ca))
                mesh.cvert[corner + 1] = nv
            track(corner); track(corner + 1); track(corner + 2)
            stack[-1] = corner
        elif sym == TOP_S:
            if not stack:
                raise ValueError("S on empty stack")
            cb = stack.pop()
            if sid in split_corners:
                stack.append(split_corners.pop(sid))
            if not stack:
                raise ValueError("S without second corner")
            ca = stack[-1]
            mesh.set_opp(ca, corner + 2)
            mesh.set_opp(cb, corner + 1)
            vp = mesh.vert(mesh.prv(ca))
            vn = mesh.vert(mesh.nxt(cb))
            if vp != vn:
                mesh.merge(vp, vn)
            mesh.cvert[corner] = vp
            mesh.cvert[corner + 1] = mesh.vert(mesh.nxt(ca))
            mesh.cvert[corner + 2] = mesh.vert(mesh.prv(cb))
            track(corner); track(corner + 1); track(corner + 2)
            stack[-1] = corner
        elif sym == TOP_E:
            mesh.cvert[corner] = mesh.new_vertex()
            mesh.cvert[corner + 1] = mesh.new_vertex()
            mesh.cvert[corner + 2] = mesh.new_vertex()
            track(corner); track(corner + 1); track(corner + 2)
            stack.append(corner)
        else:
            raise ValueError(f"bad symbol {sym}")
        processed.append(corner)
        # topology split sources keyed by decoder symbol id
        if sid in by_source:
            for split_id, edge in by_source[sid]:
                top = stack[-1]
                if edge == 1:  # RIGHT_FACE_EDGE
                    saved = mesh.nxt(top) if K['split_right_next'] else mesh.prv(top)
                else:
                    saved = mesh.prv(top) if K['split_right_next'] else mesh.nxt(top)
                split_corners[split_id] = saved
    # start faces: one config bit per remaining active corner
    start_corners = []
    while stack:
        ca = stack.pop()
        interior = start_face_dec.decode_bit()
        if interior:
            corner = mesh.add_face()
            # walk the hole boundary: it must be a triangle
            guard = len(mesh.opp) + 3
            cb = mesh.prv(ca)
            while mesh.opp[cb] != INVALID:
                cb = mesh.prv(mesh.opp[cb])
                guard -= 1
                if guard <= 0:
                    raise ValueError("hole walk does not terminate")
            cc = mesh.nxt(ca)
            while mesh.opp[cc] != INVALID:
                cc = mesh.nxt(mesh.opp[cc])
                guard -= 1
                if guard <= 0:
                    raise ValueError("hole walk does not terminate")
            mesh.set_opp(corner, ca)
            mesh.set_opp(corner + 1, cb)
            mesh.set_opp(corner + 2, cc)
            mesh.cvert[corner + 1] = mesh.vert(mesh.nxt(ca))   # opposite winding
            mesh.cvert[corner + 2] = mesh.vert(mesh.prv(ca))
            # tip: the third hole vertex
            mesh.cvert[corner] = mesh.vert(mesh.nxt(cb))
            if mesh.vert(mesh.prv(cc)) != mesh.vert(corner):
                raise ValueError("interior start face hole is not a triangle")
            processed.append(corner)
            start_corners.append(corner)
        else:
            start_corners.append(ca)
    return processed


def dfs_attribute_order(mesh, corner_order, knobs):
    """DepthFirstTraverser replay: returns list mapping data index ->
    vertex, and dict vertex -> data index."""
    K = knobs
    nf = len(mesh.opp) // 3
    face_visited = [False] * nf
    vert_visited = {}
    order = []  # data index -> vertex

    def visit(v):
        if v not in vert_visited:
            vert_visited[v] = len(order)
            order.append(v)
            return True
        return False

    def right(c):
        return mesh.opp[mesh.nxt(c)] if K['right_is_opp_next'] else mesh.opp[mesh.prv(c)]

    def left(c):
        return mesh.opp[mesh.prv(c)] if K['right_is_opp_next'] else mesh.opp[mesh.nxt(c)]

    for start in corner_order:
        if face_visited[start // 3]:
            continue
        stack = [start]
        visit(mesh.vert(mesh.nxt(start)))
        visit(mesh.vert(mesh.prv(start)))
        while stack:
            c = stack[-1]
            f = c // 3
            if face_visited[f]:
                stack.pop()
                continue
            while True:
                face_visited[f] = True
                v = mesh.vert(c)
                if v not in vert_visited:
                    on_boundary = mesh.is_boundary_vertex(c)
                    visit(v)
                    if not on_boundary:
                        c = right(c)
                        f = c // 3
                        continue
                rc = right(c)
                lc = left(c)
                rf = rc // 3 if rc != INVALID else INVALID
                lf = lc // 3 if lc != INVALID else INVALID
                r_done = rf == INVALID or face_visited[rf]
                l_done = lf == INVALID or face_visited[lf]
                if r_done and l_done:
                    stack.pop()
                    break
                elif r_done:
                    c, f = lc, lf
                elif l_done:
                    c, f = rc, rf
                else:
                    if K['dfs_right_first']:
                        stack[-1] = lc
                        stack.append(rc)
                        c, f = rc, rf
                    else:
                        stack[-1] = rc
                        stack.append(lc)
                        c, f = lc, lf
    return order, vert_visited


def decode_draco_mesh(data, knobs=None):
    """Full decode. Returns (positions [n][3] float, faces [m][3] data-index,
    metadata dict)."""
    K = dict(DEFAULT_KNOBS)
    if knobs:
        K.update(knobs)
    b = Buf(data)
    if b.raw(5) != b'DRACO':
        raise ValueError("not draco")
    major, minor = b.u8(), b.u8()
    if (major, minor) != (2, 2):
        raise ValueError(f"unsupported draco bitstream {major}.{minor}")
    enc_type = b.u8()
    method = b.u8()
    if enc_type != 1 or method != 1:
        raise ValueError("only edgebreaker triangular mesh supported")
    flags = b.u16()
    meta = {}
    if flags & 0x8000:
        if b.varint() != 0:
            raise ValueError("attribute metadata unsupported")
        n = b.varint()
        for _ in range(n):
            key = b.raw(b.u8()).decode()
            meta[key] = bytes(b.raw(b.u8()))
        if b.varint() != 0:
            raise ValueError("sub metadata unsupported")
    trav = b.u8()
    if trav != 0:
        raise ValueError(f"only standard traversal supported, got {trav}")
    num_vertices = b.varint()
    num_faces = b.varint()
    num_attribute_data = b.u8()
    if num_attribute_data != 0:
        raise ValueError("attribute seams unsupported")
    num_symbols = b.varint()
    num_split_symbols = b.varint()
    # v2.2: topology split events come first, inline in the main buffer
    num_splits = b.varint()
    splits = {}
    if num_splits:
        raw_events = []
        last_source = 0
        for _ in range(num_splits):
            delta = b.varint()
            source = delta + last_source
            delta2 = b.varint()
            split = source - delta2
            raw_events.append((source, split))
            last_source = source
        ebits = Bits(b.d[b.p:])
        for i in range(num_splits):
            edge = ebits.bit()
            source, split = raw_events[i]
            # encoder ids -> decoder ids
            dsource = num_symbols - source - 1
            dsplit = num_symbols - split - 1
            splits[dsplit] = (dsource, edge)
        b.p += (ebits.off + 7) // 8
    # traversal: symbol bits (varint byte count), then start-face rANS
    sym_bytes = b.varint()
    bits = Bits(b.raw(sym_bytes))
    start_face_dec = RAnsBitDecoder(b)
    mesh = EdgebreakerMesh()
    corner_order = decode_connectivity(
        mesh, bits, start_face_dec, num_symbols, splits, K)
    nf_actual = len(mesh.opp) // 3
    if nf_actual != num_faces:
        raise ValueError(f"face count {nf_actual} != {num_faces}")
    # distinct vertices
    roots = {mesh.find(v) for v in range(len(mesh.parent))}
    if len(roots) != num_vertices:
        raise ValueError(f"vertex count {len(roots)} != {num_vertices}")
    # ---- attributes ----
    nad = b.u8()
    if nad != 1:
        raise ValueError(f"expected 1 attributes decoder, got {nad}")
    att_data_id = b.i8()
    dec_type = b.u8()   # 0 = MESH_VERTEX_ATTRIBUTE
    trav_method = b.u8()  # 0 = DEPTH_FIRST
    if dec_type != 0 or trav_method != 0:
        raise ValueError("only vertex attribute w/ depth-first supported")
    natts = b.varint()
    if natts != 1:
        raise ValueError("expected single attribute")
    att_type = b.u8()
    data_type = b.u8()
    ncomp = b.u8()
    normalized = b.u8()
    unique_id = b.varint()
    if att_type != 0 or data_type != 9 or ncomp != 3:
        raise ValueError(f"expected float32[3] POSITION, got {att_type}/{data_type}/{ncomp}")
    # sequential decoder
    seq_type = b.u8()
    if seq_type != 2:
        raise ValueError(f"expected quantization sequential decoder, got {seq_type}")
    pred_method = b.i8()
    if pred_method not in (0, 1):  # DIFFERENCE or MESH_PREDICTION_PARALLELOGRAM
        raise ValueError(f"unsupported prediction method {pred_method}")
    transform_type = b.i8()
    if transform_type != 1:  # PREDICTION_TRANSFORM_WRAP
        raise ValueError(f"expected wrap transform, got {transform_type}")
    compressed = b.u8()
    nvals = num_vertices * 3
    if compressed:
        syms = decode_symbols(b, nvals, 3)
    else:
        nbytes = b.u8()
        syms = [int.from_bytes(b.raw(nbytes), 'little') for _ in range(nvals)]
    # prediction transform data: wrap min/max
    wrap_min = b.i32()
    wrap_max = b.i32()
    dif = wrap_max - wrap_min + 1
    # zigzag (wrap corrections are signed)
    corr = [zigzag(s) for s in syms]
    # attribute traversal order
    order, vert_to_data = dfs_attribute_order(mesh, list(corner_order), K)
    if len(order) != num_vertices:
        raise ValueError(f"traversal visited {len(order)} != {num_vertices}")
    # parallelogram + wrap reconstruction in traversal order
    vals = [0] * nvals

    def clamp(x):
        return wrap_min if x < wrap_min else (wrap_max if x > wrap_max else x)

    def wrap_apply(pred, co, out_idx):
        for c in range(3):
            v = clamp(pred[c]) + co[c]
            if v > wrap_max:
                v -= dif
            elif v < wrap_min:
                v += dif
            vals[out_idx + c] = v

    # data entry -> one corner attached to that vertex (first-visit corner)
    data_to_corner = [None] * num_vertices
    # recompute first-visit corners with a light second pass
    seen = {}
    for c in range(len(mesh.cvert)):
        v = mesh.vert(c)
        if v not in seen:
            seen[v] = []
        seen[v].append(c)
    # the parallelogram uses the corner STORED at visit time; replicate via
    # the traversal: rerun and record
    order2, _ = dfs_attribute_order(mesh, list(corner_order), K)
    assert order2 == order
    # record visit corners: rerun dfs but capturing corners
    visit_corners = dfs_visit_corners(mesh, list(corner_order), K)
    wrap_apply((0, 0, 0), corr[0:3], 0)
    for p in range(1, num_vertices):
        ci = visit_corners[p]
        pred = None
        oc = mesh.opp[ci] if pred_method == 1 else INVALID
        if oc != INVALID:
            vo = vert_to_data.get(mesh.vert(oc))
            vn = vert_to_data.get(mesh.vert(mesh.nxt(oc)))
            vp = vert_to_data.get(mesh.vert(mesh.prv(oc)))
            if vo is not None and vn is not None and vp is not None and \
               vo < p and vn < p and vp < p:
                pred = tuple(vals[vn*3+c] + vals[vp*3+c] - vals[vo*3+c] for c in range(3))
        if pred is None:
            pred = tuple(vals[(p-1)*3:(p-1)*3+3])
        wrap_apply(pred, corr[p*3:p*3+3], p * 3)
    # quantization params
    qmin = [b.f32() for _ in range(3)]
    qrange = b.f32()
    qbits = b.u8()
    if b.remaining() != 0:
        raise ValueError(f"buffer not exhausted: {b.remaining()} left")
    scale = qrange / ((1 << qbits) - 1)
    positions = [
        (qmin[0] + vals[i*3] * scale,
         qmin[1] + vals[i*3+1] * scale,
         qmin[2] + vals[i*3+2] * scale)
        for i in range(num_vertices)
    ]
    faces = []
    for f in range(nf_actual):
        faces.append(tuple(vert_to_data[mesh.vert(3*f + k)] for k in range(3)))
    meta_out = dict(meta)
    meta_out['_qbits'] = qbits
    meta_out['_pred_method'] = pred_method
    meta_out['_qmin'] = qmin
    meta_out['_qrange'] = qrange
    return positions, faces, meta_out


def dfs_visit_corners(mesh, corner_order, knobs):
    """Same traversal as dfs_attribute_order but records, per data index,
    the corner at which the vertex was first visited."""
    K = knobs
    nf = len(mesh.opp) // 3
    face_visited = [False] * nf
    vert_visited = {}
    corners = []

    def visit(v, c):
        if v not in vert_visited:
            vert_visited[v] = len(corners)
            corners.append(c)
            return True
        return False

    def right(c):
        return mesh.opp[mesh.nxt(c)] if K['right_is_opp_next'] else mesh.opp[mesh.prv(c)]

    def left(c):
        return mesh.opp[mesh.prv(c)] if K['right_is_opp_next'] else mesh.opp[mesh.nxt(c)]

    for start in corner_order:
        if face_visited[start // 3]:
            continue
        stack = [start]
        visit(mesh.vert(mesh.nxt(start)), mesh.nxt(start))
        visit(mesh.vert(mesh.prv(start)), mesh.prv(start))
        while stack:
            c = stack[-1]
            f = c // 3
            if face_visited[f]:
                stack.pop()
                continue
            while True:
                face_visited[f] = True
                v = mesh.vert(c)
                if v not in vert_visited:
                    on_boundary = mesh.is_boundary_vertex(c)
                    visit(v, c)
                    if not on_boundary:
                        c = right(c)
                        f = c // 3
                        continue
                rc = right(c)
                lc = left(c)
                rf = rc // 3 if rc != INVALID else INVALID
                lf = lc // 3 if lc != INVALID else INVALID
                r_done = rf == INVALID or face_visited[rf]
                l_done = lf == INVALID or face_visited[lf]
                if r_done and l_done:
                    stack.pop()
                    break
                elif r_done:
                    c, f = lc, lf
                elif l_done:
                    c, f = rc, rf
                else:
                    if K['dfs_right_first']:
                        stack[-1] = lc
                        stack.append(rc)
                        c, f = rc, rf
                    else:
                        stack[-1] = rc
                        stack.append(lc)
                        c, f = lc, lf
    return corners
