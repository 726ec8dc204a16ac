"""Build an approximate sf1-style replica of /root/testdata/sf0.1 for
round-7 perf measurement ONLY (never correctness: key spaces are remapped
and texts salted, so results differ from any driver dataset).

Replicates each table xN with disjoint key ranges, writes ONE parquet
file per table with pyarrow defaults (same writer shape as the sf0.1
testdata: single file; row groups split at pyarrow's default 1Mi rows) —
the layout the driver's generator plausibly produces at larger SF.

Usage: python tools/make_scaled_sf.py [N] [outdir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key columns to offset per replica so joins keep the same selectivity
OFFSETS = {
    "lineitem": {"l_orderkey": 600000, "l_partkey": 20000, "l_suppkey": 1000},
    "orders": {"o_orderkey": 600000, "o_custkey": 15000},
    "customer": {"c_custkey": 15000},
    "part": {"p_partkey": 20000},
    "supplier": {"s_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 300},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
SMALL = ("region", "nation")  # dims: keep as-is


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfbig_x{n}"
    os.makedirs(out, exist_ok=True)
    for name in SMALL:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
        print(name, t.num_rows)
    for name, offs in OFFSETS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(n):
            r = t
            for col, step in offs.items():
                idx = r.schema.get_field_index(col)
                shifted = pc.add(r.column(col), i * step)
                r = r.set_column(idx, col, shifted.cast(t.schema.field(col).type))
            if name == "documents" and i > 0:
                # salt texts so replicas are not near-dup clones of each
                # other (the driver's larger corpora are fresh text, not
                # copies; unsalted replicas would fabricate hot LSH buckets)
                idx = r.schema.get_field_index("text")
                salted = pc.binary_join_element_wise(
                    pc.cast(r.column("text"), pa.string()), f"r{i}", " "
                )
                r = r.set_column(idx, "text", salted)
            parts.append(r)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{name}.parquet")
        f = pq.ParquetFile(f"{out}/{name}.parquet")
        print(name, big.num_rows, "rgs=", f.metadata.num_row_groups,
              "MB=", round(os.path.getsize(f'{out}/{name}.parquet') / 1e6, 1))
    print("done:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
