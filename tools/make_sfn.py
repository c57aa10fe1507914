"""Build a deterministic ×N scale-up of a testdata sf directory.

The driver provides sf0.001/0.01/0.1; the round-5 verdict asks for one
sf1.0-scale bench row to confirm per-query constants grow linearly (a
hidden superlinear term — an accidental cross join, a driver-side
collect — would show up as a >>10× step). No external data: each table is
the sf0.1 table replicated N times with integer key/id columns offset per
copy (so joins/groupBys keep realistic key cardinality), written as a
DIRECTORY of N parquet part files named `{table}.parquet` — Spark reads a
part-file directory exactly like a single file, and N parts also avoid the
single-row-group parallelism trap of pandas-written files.

Usage: python tools/make_sfn.py /root/testdata/sf0.1 /tmp/ssc_sf1 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns to offset per copy: anything that identifies a row/entity, so the
# scaled table has N× distinct keys (not N duplicates of each key)
_KEY_HINTS = ("key", "_id", "doc_id", "vec_id", "id")


def _is_key(name: str, typ: pa.DataType) -> bool:
    return pa.types.is_integer(typ) and any(
        name == h or name.endswith(h) for h in _KEY_HINTS
    )


def scale_table(src: str, dst_dir: str, factor: int) -> None:
    t = pq.read_table(src)
    os.makedirs(dst_dir, exist_ok=True)
    offsets = {
        f.name: (pc.max(t.column(f.name)).as_py() or 0) + 1
        for f in t.schema
        if _is_key(f.name, f.type)
    }
    for i in range(factor):
        cols = []
        for f in t.schema:
            c = t.column(f.name)
            if f.name in offsets and i > 0:
                c = pc.add(c, pa.scalar(offsets[f.name] * i, type=f.type))
            cols.append(c)
        pq.write_table(
            pa.table(dict(zip(t.schema.names, cols))),
            os.path.join(dst_dir, f"part-{i:05d}.parquet"),
        )


def main() -> None:
    src_dir, dst_root, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst_root, exist_ok=True)
    for name in TABLES:
        src = os.path.join(src_dir, f"{name}.parquet")
        if not os.path.exists(src):
            print(f"skip {name} (absent)")
            continue
        scale_table(src, os.path.join(dst_root, f"{name}.parquet"), factor)
        print(f"{name}: x{factor}")


if __name__ == "__main__":
    main()
