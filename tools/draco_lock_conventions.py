#!/usr/bin/env python3
"""Lock the ambiguous orientation conventions in draco_decode.py against the
reference's committed fixtures:
 1. fragment 186578533298995658 exists in BOTH mesh_mip_2_draco_sv16 (draco)
    and mesh_mip_2_err_40_sv16 (uncompressed precomputed) with identical
    geometry -> position-level golden (tolerance = one quantization step).
 2. every one of the 24 draco fragments must decode with exact vertex/face
    counts and fully-exhausted buffers.
 3. edge-length sanity: wrong traversal order scrambles positions ->
    enormous edges.
"""
import glob, gzip, itertools, struct, sys
sys.path.insert(0, '/root/repo/tools')
import draco_decode as dd

DRACO_DIR = '/root/reference/test/test_cv/mesh_mip_2_draco_sv16'
PRE_DIR = '/root/reference/test/test_cv/mesh_mip_2_err_40_sv16'
TINY = '186578533298995658'


def load_precomputed(segid):
    d = gzip.decompress(open(f'{PRE_DIR}/9{segid}:0.gz', 'rb').read())
    nv = struct.unpack_from('<I', d, 0)[0]
    verts = [struct.unpack_from('<3f', d, 4 + 12*i) for i in range(nv)]
    off = 4 + 12*nv
    nf = (len(d) - off) // 12
    faces = [struct.unpack_from('<3I', d, off + 12*i) for i in range(nf)]
    return verts, faces


def match_tiny(knobs):
    data = open(glob.glob(f'{DRACO_DIR}/{TINY}:0:*')[0], 'rb').read()
    pos, faces, meta = dd.decode_draco_mesh(data, knobs)
    gold_v, gold_f = load_precomputed(TINY)
    if len(pos) != len(gold_v) or len(faces) != len(gold_f):
        return False, 'count'
    tol = meta['_qrange'] / ((1 << meta['_qbits']) - 1) * 0.51
    # greedy nearest matching: every golden vertex must have a decoded
    # vertex within half a quantization step
    used = [False] * len(pos)
    perm = {}
    for gi, gv in enumerate(gold_v):
        best, bd = -1, 1e30
        for pi, pv in enumerate(pos):
            if used[pi]:
                continue
            d = max(abs(gv[k]-pv[k]) for k in range(3))
            if d < bd:
                best, bd = pi, d
        if bd > tol:
            return False, f'vertex {gi} off by {bd:.2f} (tol {tol:.2f})'
        used[best] = True
        perm[best] = gi
    # faces must match as vertex sets after permutation
    gold_sets = sorted(tuple(sorted(f)) for f in gold_f)
    got_sets = sorted(tuple(sorted(perm[v] for v in f)) for f in faces)
    if gold_sets != got_sets:
        return False, 'faces differ'
    return True, 'exact'


def decode_all(knobs, verbose=False):
    """Decode every fixture; return (#ok, max_median_edge_ratio)."""
    ok = 0
    worst = 0.0
    for path in sorted(glob.glob(f'{DRACO_DIR}/*:0:*')):
        try:
            pos, faces, meta = dd.decode_draco_mesh(open(path, 'rb').read(), knobs)
            # edge sanity: median edge length vs quantization range
            import statistics
            edges = []
            for f in faces[:2000]:
                for a, b in ((0, 1), (1, 2), (2, 0)):
                    pa, pb = pos[f[a]], pos[f[b]]
                    edges.append(max(abs(pa[k]-pb[k]) for k in range(3)))
            med = statistics.median(edges)
            worst = max(worst, med / meta['_qrange'])
            ok += 1
        except Exception as e:
            if verbose:
                print(f'  FAIL {path.split("/")[-1][:30]}: {e}')
    return ok, worst


if __name__ == '__main__':
    keys = ['r_glue_plus', 'split_right_next', 'right_is_opp_next', 'dfs_right_first']
    vals = [(1, 2), (0, 1), (0, 1), (0, 1)]
    winners = []
    for combo in itertools.product(*vals):
        knobs = dict(zip(keys, combo))
        try:
            ok, msg = match_tiny(knobs)
        except Exception as e:
            ok, msg = False, f'exc: {e}'
        tag = 'TINY-OK ' if ok else '        '
        n_all, worst = decode_all(knobs)
        print(f'{tag}{knobs} -> tiny={msg}; all={n_all}/24 worst_med_edge={worst:.4f}')
        if ok and n_all == 24:
            winners.append((knobs, worst))
    print()
    for k, w in winners:
        print('WINNER', k, 'worst median edge ratio', w)
