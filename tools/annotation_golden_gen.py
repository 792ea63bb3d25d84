#!/usr/bin/env python3
"""Golden parquet from the reference's committed H01-derived annotation
layer (test/test_precomputed_annotation — CC-BY per its README).
Independent stdlib parse of the neuroglancer_annotations_v1 encodings
(spec: annotation/reader.py + metadata.py in the reference), self-checked
against the reference's own test numbers (test/test_annotations.py):
  - spatial0/0_0_0: 10043 POINT annotations, 7 distinct class labels,
    10043 distinct ids
  - by_id/3867588737: geometry (1937760, 1318752, 96921)
  - skeleton_id/243895108: 4 annotations, all class_label 0 ('axon')
"""
import gzip, struct
import pyarrow as pa
import pyarrow.parquet as pq

DIR = '/root/reference/test/test_precomputed_annotation'
OUT = '/root/repo/src/test/resources/golden'

ENUM = {0:'axon',1:'dendrite',2:'astrocyte',3:'soma',4:'cilium',5:'AIS',
        1000:'myelinated axon',1001:'myelinated axon',
        1002:'myelinated fragment',1003:'myelinated fragment',
        1004:'myelinated fragment',1005:'myelinated fragment'}

def read(path):
    return gzip.decompress(open(path, 'rb').read())

def decode_multi(data):
    """count u64le; per record: 3 f32 + 1 i32 (class_label, no pad);
    then count x u64le ids."""
    n = struct.unpack_from('<Q', data, 0)[0]
    rec = 16
    assert len(data) == 8 + n * (rec + 8), (len(data), n)
    out = []
    off = 8
    for _ in range(n):
        x, y, z, lab = struct.unpack_from('<3fi', data, off)
        out.append([x, y, z, lab])
        off += rec
    ids = struct.unpack_from(f'<{n}Q', data, off)
    return [(ids[i], *out[i]) for i in range(n)]

def main():
    rows = decode_multi(read(f'{DIR}/spatial0/0_0_0.gz'))
    assert len(rows) == 10043, len(rows)
    assert len({r[0] for r in rows}) == 10043
    # the reference test counts distinct label STRINGS (7): enum values
    # 1000/1001 share 'myelinated axon', 1002/1003 'myelinated fragment'
    labels = {r[4] for r in rows}
    assert len({ENUM[v] for v in labels}) == 7, labels
    pq.write_table(pa.table({
        'id': pa.array([r[0] for r in rows], pa.int64()),
        'x': pa.array([r[1] for r in rows], pa.float64()),
        'y': pa.array([r[2] for r in rows], pa.float64()),
        'z': pa.array([r[3] for r in rows], pa.float64()),
        'class_label': pa.array([r[4] for r in rows], pa.int64()),
        'class_name': pa.array([ENUM[r[4]] for r in rows], pa.string()),
    }), f'{OUT}/annotation_h01_spatial.parquet')

    # by_id single-annotation encoding: record + per-relationship
    # (u32 count + u64 ids)
    d = read(f'{DIR}/by_id/3867588737.gz')
    x, y, z, lab = struct.unpack_from('<3fi', d, 0)
    nrel = struct.unpack_from('<I', d, 16)[0]
    relids = struct.unpack_from(f'<{nrel}Q', d, 20)
    assert len(d) == 20 + 8 * nrel, (len(d), nrel)
    assert abs(x - 1.937760e6) < 1 and abs(y - 1.318752e6) < 1 and abs(z - 9.69210e4) < 1, (x, y, z)
    print(f"by_id golden: xyz=({x},{y},{z}) label={lab} rel_ids={relids}")

    rel = decode_multi(read(f'{DIR}/skeleton_id/243895108.gz'))
    assert len(rel) == 4 and {r[4] for r in rel} == {0}, rel
    pq.write_table(pa.table({
        'id': pa.array([r[0] for r in rel], pa.int64()),
        'x': pa.array([r[1] for r in rel], pa.float64()),
        'y': pa.array([r[2] for r in rel], pa.float64()),
        'z': pa.array([r[3] for r in rel], pa.float64()),
        'class_label': pa.array([r[4] for r in rel], pa.int64()),
    }), f'{OUT}/annotation_h01_rel.parquet')
    print(f"spatial rows={len(rows)} labels={sorted(labels)} rel rows={len(rel)}")

if __name__ == '__main__':
    main()
