#!/usr/bin/env python3
"""Lock the ambiguous orientation conventions in draco_decode.py against the
reference's committed fixtures (the procedure documented in
src/main/scala/graft/core/Draco.scala).

Criteria, applied to every knob combination:
 1. every draco fragment file (the *:0:* glob — 21 as committed; the 22nd
    directory entry is the manifest) must decode with exact vertex/face
    counts and fully-exhausted buffers;
 2. end-to-end anchor: replaying the reference's chunk-boundary dedup
    (mesh.py:379-419) over ALL decoded fragments must yield exactly the
    3 connected components the reference's own test asserts
    (test/test_graphene.py:490-501);
 3. among combos passing 1-2, the winner is the one with minimal median
    surface edge length (wrong traversal order scrambles vertex->face
    incidence and stretches edges).

Findings as of the r15 re-run (recorded so the procedure stays honest):
 - three combos pass gates 1-2: (r_glue_plus=2, split_right_next=1) with
   (right_is_opp_next, dfs_right_first) in {(0,0), (0,1), (1,1)};
 - all three produce IDENTICAL per-fragment vertex POSITION multisets and
   identical stitch components — every quantity an oracle entry consumes
   (f16c positions, a6c components) is invariant across the family;
 - they differ only in face-index assembly; gate 3 uniquely selects the
   committed DEFAULT_KNOBS (2,1,0,1), whose worst median-edge ratio
   (0.0353) is the family minimum.
 - an earlier revision of this tool compared the tiny fragment against
   mesh_mip_2_err_40_sv16/9<segid>:0.gz — that file is the graphene ROOT's
   consolidated mesh (a different geometry that merely shares a vertex
   count), so the check could never pass and was removed.
"""
import glob, itertools, statistics, sys
sys.path.insert(0, '/root/repo/tools')
import draco_decode as dd

DRACO_DIR = '/root/reference/test/test_cv/mesh_mip_2_draco_sv16'
# reference dedup constants for this layer (test_graphene.py fixture info):
# graph chunk_size [512,512,128] * resolution [8,8,40] nm, uniform draco
# grid 21, chunks_start_at_voxel_offset=false
GRID = 21.0
CHUNK = (4096.0, 4096.0, 5120.0)


def decode_all(knobs, verbose=False):
    """Decode every fixture; return (#ok, worst median-edge ratio, frags)."""
    ok = 0
    worst = 0.0
    frags = []
    for path in sorted(glob.glob(f'{DRACO_DIR}/*:0:*')):
        try:
            pos, faces, meta = dd.decode_draco_mesh(open(path, 'rb').read(), knobs)
            edges = []
            for f in faces[:2000]:
                for a, b in ((0, 1), (1, 2), (2, 0)):
                    pa, pb = pos[f[a]], pos[f[b]]
                    edges.append(max(abs(pa[k] - pb[k]) for k in range(3)))
            worst = max(worst, statistics.median(edges) / meta['_qrange'])
            frags.append((pos, faces))
            ok += 1
        except Exception as e:
            if verbose:
                print(f'  FAIL {path.split("/")[-1][:30]}: {e}')
    return ok, worst, frags


def stitch_ccs(frags):
    """Reference chunk-boundary dedup + connected components
    (mesh.py:379-419 / test_graphene.py:490-501 expects 3)."""
    from collections import Counter

    def gk(p):
        return (round(p[0] / GRID), round(p[1] / GRID), round(p[2] / GRID))

    def aligned(p):
        for k in range(3):
            m = p[k] % CHUNK[k]
            if m < GRID / 2 or CHUNK[k] - m <= GRID / 2:
                return True
        return False

    cnt = Counter(gk(p) for pos, _ in frags for p in pos)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    all_nodes = set()
    for idx, (pos, faces) in enumerate(frags):
        nm = [gk(p) if (cnt[gk(p)] == 2 and aligned(p)) else (idx, vid)
              for vid, p in enumerate(pos)]
        all_nodes.update(nm)
        for f in faces:
            union(nm[f[0]], nm[f[1]])
            union(nm[f[1]], nm[f[2]])
    return len({find(n) for n in all_nodes})


if __name__ == '__main__':
    n_frags = len(glob.glob(f'{DRACO_DIR}/*:0:*'))
    keys = ['r_glue_plus', 'split_right_next', 'right_is_opp_next', 'dfs_right_first']
    vals = [(1, 2), (0, 1), (0, 1), (0, 1)]
    gated = []
    pos_sets = {}
    for combo in itertools.product(*vals):
        knobs = dict(zip(keys, combo))
        n_all, worst, frags = decode_all(knobs)
        ccs = stitch_ccs(frags) if n_all == n_frags else -1
        tag = 'GATED  ' if (n_all == n_frags and ccs == 3) else '       '
        print(f'{tag}{knobs} -> all={n_all}/{n_frags} ccs={ccs} '
              f'worst_med_edge={worst:.4f}')
        if n_all == n_frags and ccs == 3:
            gated.append((knobs, worst))
            pos_sets[tuple(combo)] = [sorted(pos) for pos, _ in frags]
    print()
    # position-invariance across the gated family: the quantities the
    # oracle entries consume must not depend on the residual ambiguity
    sets = list(pos_sets.values())
    invariant = all(s == sets[0] for s in sets[1:])
    print(f'gated family position-multisets identical: {invariant}')
    for k, w in sorted(gated, key=lambda t: t[1]):
        print('GATED', k, 'worst median edge ratio', f'{w:.4f}')
    if gated:
        win = min(gated, key=lambda t: t[1])
        print('WINNER (minimal edge length)', win[0])
