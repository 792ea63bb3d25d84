# Golden-oracle generator for the reference's committed spatial-index tile
# /root/reference/test/test_cv/skeletons_mip_2/0-8192_0-8192_0-20480.spatial
# (spatial_index.py:248-307 file format: JSON map segid -> [x0,y0,z0,x1,y1,z1]).
# The parse here is an independent implementation (stdlib json) of what the
# Spark side does with from_json over a MapType — the DuckDB oracle reads the
# parquet emitted here, closing the loop on the engine's .spatial ingestion of
# the reference's own committed bytes.
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/reference/test/test_cv/skeletons_mip_2/0-8192_0-8192_0-20480.spatial"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "golden", "skeleton_spatial.parquet")

with open(SRC) as fh:
    m = json.load(fh)

labels = sorted(int(k) for k in m)
cols = {"label": labels}
for i, name in enumerate(["x0", "y0", "z0", "x1", "y1", "z1"]):
    cols[name] = [int(m[str(l)][i]) for l in labels]
pq.write_table(
    pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()}), OUT)
print(f"wrote {OUT}: {len(labels)} labels")
