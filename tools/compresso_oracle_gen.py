# Independent compresso v1 decoder + golden-oracle generator.
#
# Decodes the reference's committed compresso-encoded golden layer
# (/root/reference/test/test_seg_unsharded, every mip) with a from-scratch
# numpy implementation of the published compresso scheme (Matejek et al.,
# MICCAI 2017; container layout reverse-derived from the fixture bytes and
# validated by three independent internal invariants, see VERIFY below).
# Emits compact golden parquet files under src/test/resources/golden/ that
# the DuckDB oracle reads, so the Scala/Spark decoder in
# src/main/scala/graft/core/Compresso.scala is checked against a second,
# independent implementation.
#
# Container layout (little-endian), version 1, steps 4x4x1, u32 labels:
#   header   36 B : magic 'cpso', version u8, data_width u8, sx/sy/sz u16,
#                   xstep/ystep/zstep u8, id_size u64, value_size u32,
#                   location_size u64, connectivity u8
#   ids      u32[id_size]       per-slice connected-component labels,
#                               slices in z order, raster discovery order
#   values   u16[value_size]    sorted distinct 4x4x1 boundary-window bitmasks
#   locations u32[location_size] indeterminate-voxel codes (forward raster):
#                               1 -> copy east, 3 -> copy south, c>=7 -> label c-7
#   windows  u16 RLE tokens     odd t -> run of t>>1 zero windows,
#                               even t -> literal values[t>>1]; windows raster
#                               x-window fastest, then y-window, then z
#   trailer  u32[sz] per-slice component counts, u32[sz] per-slice location
#                               counts shifted by one slice (random access aid)
#
# Boundary semantics: voxel is boundary iff its label differs from its east
# (x+1) or south (y+1) in-slice neighbor. Hence a boundary voxel with a
# non-boundary north/west neighbor provably shares that neighbor's label
# (the determinate rule); the rest consume location codes, resolved in
# reverse raster order because codes reference east/south neighbors.
#
# VERIFY: for every chunk the decoder asserts (a) per-slice CC counts equal
# the trailer, (b) the location stream is consumed exactly, and (c) the
# boundary mask recomputed from the decoded labels is bit-identical to the
# stored window stream. (c) closes the loop: a wrong decode cannot reproduce
# the mask that generated it.
import glob
import os
import re
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference/test/test_seg_unsharded"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")


def parse(fname):
    import gzip

    with gzip.open(fname, "rb") as fh:
        d = fh.read()
    magic, ver, dw, sx, sy, sz, xs, ys, zs = struct.unpack_from("<4sBBHHHBBB", d, 0)
    assert magic == b"cpso" and ver == 1 and dw == 4 and (xs, ys, zs) == (4, 4, 1), (
        magic, ver, dw, xs, ys, zs)
    ids_n, vals_n, locs_n, conn = struct.unpack_from("<QIQB", d, 15)
    assert conn == 4
    off = 36
    ids = np.frombuffer(d, "<u4", ids_n, off); off += ids_n * 4
    vals = np.frombuffer(d, "<u2", vals_n, off); off += vals_n * 2
    locs = np.frombuffer(d, "<u4", locs_n, off); off += locs_n * 4
    nwx, nwy = sx // xs, sy // ys
    nw = nwx * nwy * sz
    w = np.frombuffer(d, "<u2", (len(d) - off) // 2, off).astype(np.int64)
    contrib = np.where(w % 2 == 1, w >> 1, 1)
    cum = np.cumsum(contrib)
    ntok = int(np.searchsorted(cum, nw)) + 1
    assert cum[ntok - 1] == nw
    widx = np.zeros(nw, np.int64)
    pos = 0
    for t in w[:ntok]:
        if t & 1:
            pos += t >> 1
        else:
            widx[pos] = t >> 1
            pos += 1
    toff = off + ntok * 2
    A = np.frombuffer(d, "<u4", sz, toff)
    B = np.frombuffer(d, "<u4", sz, toff + sz * 4)
    assert toff + sz * 8 == len(d)
    assert int(A.sum()) == ids_n
    return dict(sx=sx, sy=sy, sz=sz, xs=xs, ys=ys, ids=ids, vals=vals, locs=locs,
                widx=widx, A=A, B=B)


def boundary_mask(p):
    sx, sy, sz, xs, ys = p["sx"], p["sy"], p["sz"], p["xs"], p["ys"]
    nwx, nwy = sx // xs, sy // ys
    wv = p["vals"][p["widx"]].reshape(sz, nwy, nwx)
    bits = ((wv[..., None] >> np.arange(16)) & 1).astype(np.uint8)
    blk = bits.reshape(sz, nwy, nwx, ys, xs)
    return blk.transpose(0, 1, 3, 2, 4).reshape(sz, sy, sx)


def cc_runs(nonb):
    """4-connected per-slice CC via run union-find; labels 1..n in raster
    discovery order, 0 on boundary voxels."""
    h, w = nonb.shape
    parent = []

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    lab = np.zeros((h, w), np.int32)
    prev = []
    for y in range(h):
        idx = np.flatnonzero(np.diff(np.concatenate(([0], nonb[y].view(np.int8), [0]))))
        cur = []
        for i in range(0, len(idx), 2):
            xs_, xe = int(idx[i]), int(idx[i + 1])
            rid = len(parent)
            parent.append(rid)
            cur.append((xs_, xe, rid))
            lab[y, xs_:xe] = rid + 1
            for (pxs, pxe, prid) in prev:
                if pxs < xe and xs_ < pxe:
                    ra, rb = find(rid), find(prid)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        prev = cur
    if not parent:
        return lab, 0
    remap = np.zeros(len(parent) + 1, np.int32)
    order = {}
    n = 0
    for rid in range(len(parent)):
        r = find(rid)
        if r not in order:
            n += 1
            order[r] = n
        remap[rid + 1] = order[r]
    return remap[lab], n


def decode(fname):
    p = parse(fname)
    sx, sy, sz = p["sx"], p["sy"], p["sz"]
    m = boundary_mask(p)
    out = np.zeros((sz, sy, sx), np.uint32)
    idp = 0
    for z in range(sz):
        lab, n = cc_runs(m[z] == 0)
        assert n == p["A"][z], (z, n, p["A"][z])
        comp = p["ids"][idp:idp + n]
        idp += n
        out[z] = np.concatenate(([0], comp))[lab]
    assert idp == len(p["ids"])
    b = m.astype(bool)
    nonb_n = np.zeros_like(b); nonb_n[:, 1:, :] = ~b[:, :-1, :]
    nonb_w = np.zeros_like(b); nonb_w[:, :, 1:] = ~b[:, :, :-1]
    north = np.zeros_like(out); north[:, 1:, :] = out[:, :-1, :]
    west = np.zeros_like(out); west[:, :, 1:] = out[:, :, :-1]
    det_n = b & nonb_n
    det_w = b & ~nonb_n & nonb_w
    out[det_n] = north[det_n]
    out[det_w] = west[det_w]
    indet = b & ~nonb_n & ~nonb_w
    zs, ys, xs_ = np.nonzero(indet)
    locs = p["locs"]
    assert len(zs) == len(locs), (len(zs), len(locs))
    for i in range(len(zs) - 1, -1, -1):
        z, y, x = int(zs[i]), int(ys[i]), int(xs_[i])
        c = int(locs[i])
        if c >= 7:
            out[z, y, x] = c - 7
        elif c == 1:
            out[z, y, x] = out[z, y, x + 1]
        elif c == 3:
            out[z, y, x] = out[z, y + 1, x]
        else:
            raise AssertionError(f"unexpected location code {c}")
    # VERIFY (c): decoded labels must regenerate the stored boundary mask
    bm = np.zeros_like(m)
    bm[:, :, :-1] |= (out[:, :, :-1] != out[:, :, 1:])
    bm[:, :-1, :] |= (out[:, :-1, :] != out[:, 1:, :])
    assert np.array_equal(bm, m), f"mask reconstruction failed for {fname}"
    return out


def chunk_origin(fname):
    mz = re.match(r"(\d+)-\d+_(\d+)-\d+_(\d+)-\d+", os.path.basename(fname)[:-3])
    return tuple(int(g) for g in mz.groups())


def main():
    os.makedirs(OUT, exist_ok=True)
    label_rows = {"mip": [], "x0": [], "y0": [], "z0": [], "label": []}
    count_rows = {}  # (mip, label) -> [voxels, sum_x, sum_y, sum_z]
    cutout = None  # mip 16_16_40, x[224,288) y[224,288) z[48,112)
    CUT = (224, 288, 224, 288, 48, 112)
    for mip in ("8_8_40", "16_16_40", "32_32_40"):
        for f in sorted(glob.glob(os.path.join(REF, mip, "*.gz"))):
            x0, y0, z0 = chunk_origin(f)
            vol = decode(f)  # (sz, sy, sx)
            labs = np.unique(vol)
            label_rows["mip"] += [mip] * len(labs)
            label_rows["x0"] += [x0] * len(labs)
            label_rows["y0"] += [y0] * len(labs)
            label_rows["z0"] += [z0] * len(labs)
            label_rows["label"] += [int(v) for v in labs]
            if mip == "32_32_40":
                flat = vol.ravel()
                ulabs, inv = np.unique(flat, return_inverse=True)
                zz, yy, xx = np.indices(vol.shape)
                nvox = np.bincount(inv)
                sx_ = np.bincount(inv, weights=(xx + x0).ravel())
                sy_ = np.bincount(inv, weights=(yy + y0).ravel())
                sz_ = np.bincount(inv, weights=(zz + z0).ravel())
                for j, v in enumerate(ulabs):
                    acc = count_rows.setdefault((mip, int(v)), [0, 0, 0, 0])
                    acc[0] += int(nvox[j])
                    acc[1] += int(sx_[j])
                    acc[2] += int(sy_[j])
                    acc[3] += int(sz_[j])
            if mip == "16_16_40":
                cx0, cx1, cy0, cy1, cz0, cz1 = CUT
                ix0, ix1 = max(cx0, x0), min(cx1, x0 + vol.shape[2])
                iy0, iy1 = max(cy0, y0), min(cy1, y0 + vol.shape[1])
                iz0, iz1 = max(cz0, z0), min(cz1, z0 + vol.shape[0])
                if ix0 < ix1 and iy0 < iy1 and iz0 < iz1:
                    sub = vol[iz0 - z0:iz1 - z0, iy0 - y0:iy1 - y0, ix0 - x0:ix1 - x0]
                    zz, yy, xx = np.indices(sub.shape)
                    rows = np.stack([
                        (xx + ix0).ravel(), (yy + iy0).ravel(), (zz + iz0).ravel(),
                        sub.ravel().astype(np.int64)], axis=1)
                    cutout = rows if cutout is None else np.concatenate([cutout, rows])
            print("decoded", mip, os.path.basename(f), "labels:", len(labs), flush=True)

    pq.write_table(pa.table({k: pa.array(v) for k, v in label_rows.items()}),
                   os.path.join(OUT, "compresso_labels.parquet"))
    mips = [k[0] for k in count_rows]
    pq.write_table(pa.table({
        "mip": pa.array(mips),
        "label": pa.array([k[1] for k in count_rows], pa.int64()),
        "voxels": pa.array([v[0] for v in count_rows.values()], pa.int64()),
        "sum_x": pa.array([v[1] for v in count_rows.values()], pa.int64()),
        "sum_y": pa.array([v[2] for v in count_rows.values()], pa.int64()),
        "sum_z": pa.array([v[3] for v in count_rows.values()], pa.int64()),
    }), os.path.join(OUT, "compresso_counts.parquet"))
    order = np.lexsort((cutout[:, 0], cutout[:, 1], cutout[:, 2]))
    cutout = cutout[order]
    pq.write_table(pa.table({
        "x": pa.array(cutout[:, 0], pa.int32()),
        "y": pa.array(cutout[:, 1], pa.int32()),
        "z": pa.array(cutout[:, 2], pa.int32()),
        "label": pa.array(cutout[:, 3], pa.int64()),
    }), os.path.join(OUT, "compresso_cutout.parquet"))
    print("golden files written to", OUT)


if __name__ == "__main__":
    sys.exit(main())
