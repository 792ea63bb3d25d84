#!/usr/bin/env python3
"""Golden parquet for the reference's committed mesh_mip_2_err_40_sv16
layer (the graphene root meshes in precomputed binary, gzip-wrapped) and
its root manifest 648518346349515986:0.

These ~44 MB of committed real mesh bytes previously flowed through no
oracle entry. The generator parses each fragment independently (struct
unpack of the nv/float32x3/uint32x3 precomputed layout,
cloudvolume/mesh.py from_precomputed) and emits per-fragment counts plus
ORDER-INDEPENDENT integer checksums: the sum of the raw float32 bit
patterns of all vertex components, and the sum of all face indices —
exact integers any engine reproduces regardless of reduction order.

Output: src/test/resources/golden/mesh_err40.parquet with one row per
manifest-listed fragment.
"""
import gzip
import json
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIR = "/root/reference/test/test_cv/mesh_mip_2_err_40_sv16"
MANIFEST = "648518346349515986:0"
OUT = "/root/repo/src/test/resources/golden/mesh_err40.parquet"


def main():
    frags = json.load(open(os.path.join(DIR, MANIFEST)))["fragments"]
    rows = {"frag": [], "n_verts": [], "n_faces": [],
            "vbits_sum": [], "fidx_sum": []}
    for name in sorted(frags):
        with gzip.open(os.path.join(DIR, name + ".gz"), "rb") as fh:
            d = fh.read()
        nv = struct.unpack_from("<I", d, 0)[0]
        vbits = np.frombuffer(d, "<u4", nv * 3, 4).astype(np.int64)
        off = 4 + 12 * nv
        assert (len(d) - off) % 12 == 0, name
        nf = (len(d) - off) // 12
        fidx = np.frombuffer(d, "<u4", nf * 3, off).astype(np.int64)
        assert fidx.size == 0 or fidx.max() < nv, name
        rows["frag"].append(name)
        rows["n_verts"].append(nv)
        rows["n_faces"].append(nf)
        rows["vbits_sum"].append(int(vbits.sum()))
        rows["fidx_sum"].append(int(fidx.sum()))
    pq.write_table(pa.table({
        "frag": pa.array(rows["frag"], pa.string()),
        "n_verts": pa.array(rows["n_verts"], pa.int64()),
        "n_faces": pa.array(rows["n_faces"], pa.int64()),
        "vbits_sum": pa.array(rows["vbits_sum"], pa.int64()),
        "fidx_sum": pa.array(rows["fidx_sum"], pa.int64()),
    }), OUT)
    print(f"{len(rows['frag'])} fragments; total verts {sum(rows['n_verts'])}, "
          f"faces {sum(rows['n_faces'])}")


if __name__ == "__main__":
    main()
