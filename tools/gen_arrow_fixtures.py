#!/usr/bin/env python3
"""Arrow IPC fixtures for ArrowScanSpec, written by pyarrow — an
INDEPENDENT real writer (same cross-validation stance as the stat-file
fixtures): if graft's reader and pyarrow's writer disagree, the spec
fails. Deterministic values only.

Usage: python3 tools/gen_arrow_fixtures.py <outdir>
"""
import sys
import datetime
import decimal

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.ipc as ipc

out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/arrow"

schema = pa.schema([
    ("i8", pa.int8()),
    ("i16", pa.int16()),
    ("i32", pa.int32()),
    ("i64", pa.int64()),
    ("f32", pa.float32()),
    ("f64", pa.float64()),
    ("flag", pa.bool_()),
    ("s", pa.string()),
    ("b", pa.binary()),
    ("d", pa.date32()),
    ("ts", pa.timestamp("us")),
    ("dec", pa.decimal128(10, 2)),
    ("arr", pa.list_(pa.int64())),
    ("st", pa.struct([("a", pa.int64()), ("bb", pa.string())])),
])

rows = [
    (1, 100, 1000, 10**12, 1.5, 2.25, True, "hello", b"\x01\x02", datetime.date(2020, 1, 2),
     datetime.datetime(2021, 3, 4, 5, 6, 7, 123456), decimal.Decimal("12345.67"),
     [1, 2, 3], {"a": 7, "bb": "x"}),
    (-2, -200, -2000, -(10**12), -0.5, -2.5, False, "𝄞 non-bmp 🚀", b"", datetime.date(1969, 12, 31),
     datetime.datetime(1969, 12, 31, 23, 59, 59), decimal.Decimal("-0.01"),
     [], {"a": -1, "bb": ""}),
    (None, None, None, None, None, None, None, None, None, None, None, None, None, None),
]

cols = list(zip(*rows))
table = pa.table(
    {schema.names[i]: pa.array(cols[i], type=schema.types[i]) for i in range(len(schema.names))},
    schema=schema)

import os
os.makedirs(out, exist_ok=True)

# IPC file format, uncompressed
feather.write_feather(table, f"{out}/typed.arrow", compression="uncompressed")
# IPC file format, lz4 buffers (pyarrow's feather v2 default)
feather.write_feather(table, f"{out}/typed_lz4.feather", compression="lz4")
# IPC stream format
with ipc.new_stream(f"{out}/typed.arrows", schema) as w:
    w.write_table(table)
# multi-batch file: 3 batches of the same 3 rows -> 9 rows
with ipc.new_file(f"{out}/multi.arrow", schema) as w:
    for _ in range(3):
        w.write_table(table)

print("wrote", out)
