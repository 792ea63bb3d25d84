#!/usr/bin/env python3
"""Generate golden parquet from the reference's committed draco mesh
fixtures using the independent pure-python decoder (tools/draco_decode.py).

Outputs (src/test/resources/golden/):
  draco_vertices.parquet   (segid, vid, x, y, z)   — dequantized nm, float64
  draco_faces.parquet      (segid, fid, v0, v1, v2)
  draco_components.parquet (comp_key, n_nodes)     — after the reference's
    chunk-boundary dedup (mesh.py:379-419, is_draco_chunk_aligned) the
    face-edge graph has exactly 3 connected components, the number the
    reference's own test asserts (test/test_graphene.py:490-501).

All coordinates are exact multiples of the uniform draco grid (21 nm),
so float64 arithmetic is exact and cross-engine comparison is safe.
"""
import glob, sys
sys.path.insert(0, '/root/repo/tools')
import draco_decode as dd
import pyarrow as pa
import pyarrow.parquet as pq

DRACO_DIR = '/root/reference/test/test_cv/mesh_mip_2_draco_sv16'
OUT = '/root/repo/src/test/resources/golden'
CHUNK = (4096.0, 4096.0, 5120.0)   # graph chunk_size [512,512,128] x res [8,8,40]
GRID = 21.0                        # uniform_draco_grid_size

def main():
    vrows = {k: [] for k in ('segid', 'vid', 'x', 'y', 'z')}
    frows = {k: [] for k in ('segid', 'fid', 'v0', 'v1', 'v2')}
    all_v, all_f = [], []
    for path in sorted(glob.glob(f'{DRACO_DIR}/*:0:*')):
        segid = int(path.split('/')[-1].split(':')[0])
        pos, faces, meta = dd.decode_draco_mesh(open(path, 'rb').read())
        base = len(all_v)
        for i, p in enumerate(pos):
            vrows['segid'].append(segid); vrows['vid'].append(i)
            vrows['x'].append(p[0]); vrows['y'].append(p[1]); vrows['z'].append(p[2])
            all_v.append(tuple(p))
        for i, f in enumerate(faces):
            frows['segid'].append(segid); frows['fid'].append(i)
            frows['v0'].append(f[0]); frows['v1'].append(f[1]); frows['v2'].append(f[2])
            all_f.append((f[0]+base, f[1]+base, f[2]+base))

    # reference chunk-boundary dedup: merge vertices appearing EXACTLY
    # twice that sit within GRID/2 of a chunk border plane
    from collections import Counter
    cnt = Counter(all_v)

    def aligned(v):
        for k in range(3):
            m = v[k] % CHUNK[k]
            if m < GRID/2 or CHUNK[k] - m <= GRID/2:
                return True
        return False

    node_of = {}
    gid = []
    for i, v in enumerate(all_v):
        key = ('m', v) if (cnt[v] == 2 and aligned(v)) else ('u', i)
        if key not in node_of:
            node_of[key] = len(node_of)
        gid.append(node_of[key])
    n = len(node_of)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for f in all_f:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            ra, rb = find(gid[f[a]]), find(gid[f[b]])
            if ra != rb:
                parent[ra] = rb
    # component key = min grid key over the component's vertices
    def grid_key(v):
        return (round(v[0]/GRID) << 42) | (round(v[1]/GRID) << 21) | round(v[2]/GRID)
    comp_min = {}
    comp_nodes = {}
    seen_nodes = set()
    for i, v in enumerate(all_v):
        c = find(gid[i])
        k = grid_key(v)
        if c not in comp_min or k < comp_min[c]:
            comp_min[c] = k
        if gid[i] not in seen_nodes:
            seen_nodes.add(gid[i])
            comp_nodes[c] = comp_nodes.get(c, 0) + 1
    comps = sorted((comp_min[c], comp_nodes[c]) for c in comp_min)
    assert len(comps) == 3, f"expected 3 components (test_graphene.py:501), got {len(comps)}"

    pq.write_table(pa.table({k: pa.array(v) for k, v in vrows.items()}),
                   f'{OUT}/draco_vertices.parquet')
    pq.write_table(pa.table({k: pa.array(v) for k, v in frows.items()}),
                   f'{OUT}/draco_faces.parquet')
    pq.write_table(pa.table({
        'comp_key': pa.array([c[0] for c in comps], pa.int64()),
        'n_nodes': pa.array([c[1] for c in comps], pa.int64()),
    }), f'{OUT}/draco_components.parquet')
    print(f"vertices={len(all_v)} faces={len(all_f)} nodes={n} comps={comps}")

if __name__ == '__main__':
    main()
