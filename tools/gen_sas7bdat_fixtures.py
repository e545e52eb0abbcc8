#!/usr/bin/env python3
"""Generate SAS .sas7bdat test fixtures for Sas7bdatScanSpec.

Authored against the publicly documented (reverse-engineered) sas7bdat
format — the layout pandas' pure-Python reader implements — and
CROSS-VALIDATED by pandas.read_sas before being written: generation
fails unless pandas decodes the intended values, pinning the spec
interpretation against an independent implementation.

Three variants, all little-endian uncompressed:
  sample_meta_data.sas7bdat : 32-bit, META page (subheaders) + DATA pages
  sample_mix.sas7bdat       : 32-bit, single MIX page (subheaders + rows)
  sample_u64.sas7bdat       : 64-bit (U64) layout, MIX page

Columns: IDX f64, SCORE f64 (one missing -> NaN), NAME char(12).
"""
import math, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "sas7bdat")

MAGIC = (b"\x00\x00\x00\x00\x00\x00\x00\x00"
         b"\x00\x00\x00\x00\xc2\xea\x81\x60"
         b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
         b"\x09\xc7\x31\x8c\x18\x1f\x10\x11")

HEADER_LEN = 1024
PAGE_LEN = 4096

ROWS = [
    (1.0, 10.125, "alpha"),
    (2.0, None, "beta"),
    (3.0, -7.25, "midrowname"),
    (4.0, 2.5, "delta row"),
    (5.0, 90000000000.0, "final row!"),
]
ROW_LEN = 8 + 8 + 12  # IDX, SCORE, NAME


def u16(v): return struct.pack("<H", v)
def u32(v): return struct.pack("<I", v)
def u64v(v): return struct.pack("<Q", v)
def f64(v): return struct.pack("<d", v)


def header(page_count, u64=False):
    h = bytearray(HEADER_LEN)
    h[0:32] = MAGIC
    h[32] = 0x33 if u64 else 0x22   # '3' marks the U64 layout
    h[35] = 0x22                     # != '3': align1 = 0
    h[37] = 0x01                     # little-endian
    h[70] = 20                       # encoding: utf-8
    h[84:92] = b"DATA    "  # file type region (cosmetic)
    h[92:100] = b"GRAFT   "[:8]
    h[196:200] = u32(HEADER_LEN)
    h[200:204] = u32(PAGE_LEN)
    if u64:
        h[204:212] = u64v(page_count)
    else:
        h[204:208] = u32(page_count)
    return bytes(h)


def rowsize_subheader(row_count, mix_page_row_count, ncols, u64=False):
    il = 8 if u64 else 4
    uiv = u64v if u64 else u32
    b = bytearray(800 if u64 else 480)
    b[0:4] = b"\xF7\xF7\xF7\xF7"       # u64 signature = F7F7F7F7 00000000
    b[5 * il:6 * il] = uiv(ROW_LEN)
    b[6 * il:7 * il] = uiv(row_count)
    b[9 * il:10 * il] = uiv(ncols)      # col_count_p1
    b[10 * il:11 * il] = uiv(0)         # col_count_p2
    b[15 * il:16 * il] = uiv(mix_page_row_count)
    # lcs (354/682) / lcp (378/706) stay 0: no creator-proc string
    return bytes(b)


def colsize_subheader(ncols, u64=False):
    if u64:
        return b"\xF6\xF6\xF6\xF6\x00\x00\x00\x00" + u64v(ncols) + b"\x00" * 8
    return b"\xF6\xF6\xF6\xF6" + u32(ncols) + b"\x00" * 4


def coltext_subheader(names, u64=False):
    # text block: [u16 size][6 pad] then the names; name pointers index
    # bytes relative to the block start (size u16 included)
    blob = bytearray()
    blob += b"\x00" * 8  # placeholder for size u16 + 6 pad
    offsets = []
    for n in names:
        offsets.append(len(blob))
        blob += n.encode("ascii")
    blob[0:2] = u16(len(blob) - 0)  # block size counts from block start
    sig = b"\xFD" + b"\xFF" * (7 if u64 else 3)
    sub = sig + bytes(blob)
    return sub, offsets


def colname_subheader(offsets, names, u64=False):
    # sig(il) + 8 pad + 8-byte pointers + pad; count = (len-2*il-12)//8
    il = 8 if u64 else 4
    b = bytearray(b"\xFF" * il + b"\x00" * 8)
    for off, n in zip(offsets, names):
        b += u16(0) + u16(off) + u16(len(n)) + u16(0)
    b += b"\x00" * (2 * il + 12 + 8 * len(names) - len(b))
    return bytes(b)


def colattrs_subheader(u64=False):
    # entries of il+8: [uint row offset][u32 width][2 pad][u8 type][1 pad]
    il = 8 if u64 else 4
    uiv = u64v if u64 else u32
    b = bytearray(b"\xFC" + b"\xFF" * (il - 1) + b"\x00" * 8)
    n = 0
    for off, width, tpe in ((0, 8, 1), (8, 8, 1), (16, 12, 2)):
        b += uiv(off) + u32(width) + b"\x00\x00" + bytes([tpe]) + b"\x00"
        n += 1
    b += b"\x00" * (2 * il + 12 + (il + 8) * n - len(b))
    return bytes(b)


def format_subheader(u64=False):
    # one per column, in column order; all-zero pointer fields = no
    # format / no label (pandas reads u16s at offset+22+3*il onward)
    sig = b"\xFE\xFB" + b"\xFF" * (6 if u64 else 2)
    return sig + b"\x00" * 56


def encode_row(idx, score, name):
    out = f64(idx)
    out += f64(float("nan")) if score is None else f64(score)
    out += name.ljust(12)[:12].encode("ascii")
    return out


def make_page(page_type, subheaders, rows, block_count_override=None, u64=False):
    """page = filler | u16 type | u16 block_count | u16 sub_count |
    2B pad | pointers | subheader bodies | [aligned rows]"""
    page = bytearray(PAGE_LEN)
    bit_offset = 32 if u64 else 16
    ptr_len = 24 if u64 else 12
    ptrs_off = bit_offset + 8
    body_off = ptrs_off + ptr_len * len(subheaders)
    # place bodies from the END of the page like SAS does (also proves
    # the reader honors pointer offsets instead of assuming layout)
    cursor = PAGE_LEN
    pointers = []
    for sub in subheaders:
        cursor -= len(sub)
        pointers.append((cursor, len(sub)))
        page[cursor:cursor + len(sub)] = sub
    row_off = body_off
    row_off += (-row_off) % 8  # mix pages align rows to 8
    for i, r in enumerate(rows):
        enc = encode_row(*r)
        page[row_off + i * ROW_LEN: row_off + i * ROW_LEN + len(enc)] = enc
    assert row_off + len(rows) * ROW_LEN <= (pointers[-1][0] if pointers else PAGE_LEN)
    block_count = block_count_override
    if block_count is None:
        block_count = len(subheaders) + len(rows)
    page[bit_offset:bit_offset + 2] = u16(page_type)
    page[bit_offset + 2:bit_offset + 4] = u16(block_count)
    page[bit_offset + 4:bit_offset + 6] = u16(len(subheaders))
    for i, (off, ln) in enumerate(pointers):
        p = ptrs_off + ptr_len * i
        if u64:
            page[p:p + 24] = u64v(off) + u64v(ln) + b"\x00" * 8
        else:
            page[p:p + 12] = u32(off) + u32(ln) + b"\x00\x00\x00\x00"
    return bytes(page)


def make_data_page(rows):
    page = bytearray(PAGE_LEN)
    page[16:18] = u16(256)          # data page
    page[18:20] = u16(len(rows))    # block_count = rows on page
    page[20:22] = u16(0)
    off = 24
    for i, r in enumerate(rows):
        enc = encode_row(*r)
        page[off + i * ROW_LEN: off + i * ROW_LEN + len(enc)] = enc
    return bytes(page)


def build(layout):
    u64 = layout == "u64"
    names = ["IDX", "SCORE", "NAME"]
    text, offsets = coltext_subheader(names, u64)
    subs = [rowsize_subheader(len(ROWS), len(ROWS) if layout != "meta_data" else 0, 3, u64),
            colsize_subheader(3, u64), text,
            colname_subheader(offsets, names, u64), colattrs_subheader(u64)] + \
           [format_subheader(u64) for _ in names]
    if layout == "meta_data":
        meta = make_page(0, subs, [])
        # split rows across two data pages to prove multi-page walking
        pages = [meta, make_data_page(ROWS[:3]), make_data_page(ROWS[3:])]
    else:
        pages = [make_page(512, subs, ROWS, u64=u64)]
    return header(len(pages), u64) + b"".join(pages)


def validate(path):
    import pandas as pd
    df = pd.read_sas(path, format="sas7bdat")
    assert list(df.columns) == ["IDX", "SCORE", "NAME"], df.columns
    assert list(df["IDX"]) == [1.0, 2.0, 3.0, 4.0, 5.0], list(df["IDX"])
    assert math.isnan(df["SCORE"][1])
    assert list(df["SCORE"][[0, 2, 3, 4]]) == [10.125, -7.25, 2.5, 9e10]
    names = [x.decode().rstrip() if isinstance(x, bytes) else x.rstrip() for x in df["NAME"]]
    assert names == ["alpha", "beta", "midrowname", "delta row", "final row!"], names


def main():
    os.makedirs(OUT, exist_ok=True)
    for layout in ("meta_data", "mix", "u64"):
        path = os.path.join(OUT, f"sample_{layout}.sas7bdat")
        with open(path, "wb") as f:
            f.write(build(layout))
        validate(path)
        print("pandas cross-validation OK:", path)


if __name__ == "__main__":
    main()
