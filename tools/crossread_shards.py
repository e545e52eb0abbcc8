#!/usr/bin/env python3
"""Cross-read the sharded Arrow export with an INDEPENDENT reader.

The ArrowScanSpec/AvroScanSpec sharded-write tests leave their output
under target/{arrow,avro}-write-out/sharded. This tool re-reads the
Arrow shards with pyarrow (a reader that shares no code with the
engine) and checks the manifest row counts file by file — the
independent-reader check for the executor-side write path.

(Avro shards: no independent python reader ships in this container;
the spec already validates container magic + re-reads each shard with
avro-core, the official Apache implementation.)

Usage: python3 tools/crossread_shards.py  (after `sbt "testOnly graft.ArrowScanSpec"`)
"""
import json
import os
import sys

import pyarrow.ipc as ipc

base = os.path.join(os.path.dirname(__file__), "..", "target",
                    "arrow-write-out", "sharded")
mf_path = os.path.join(base, "_manifest.json")
if not os.path.exists(mf_path):
    sys.exit(f"no manifest at {mf_path} — run `sbt 'testOnly graft.ArrowScanSpec'` first")

mf = json.load(open(mf_path))
assert mf["format"] == "arrow", mf
total = 0
schema = None
for entry in mf["files"]:
    path = os.path.join(base, entry["name"])
    with ipc.open_file(path) as reader:
        table = reader.read_all()
    assert table.num_rows == entry["rows"], (
        f"{entry['name']}: manifest says {entry['rows']} rows, pyarrow read {table.num_rows}")
    if schema is None:
        schema = table.schema
    else:
        assert table.schema == schema, f"{entry['name']}: schema drift\n{table.schema}\nvs\n{schema}"
    total += table.num_rows
    print(f"  ok {entry['name']}: {table.num_rows} rows")

print(f"PASS: pyarrow cross-read {len(mf['files'])} shards, {total} rows, schema: "
      + ", ".join(f"{f.name}:{f.type}" for f in schema))
