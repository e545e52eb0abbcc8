#!/usr/bin/env python3
"""Generate SPSS .sav test fixtures for SavScanSpec.

No independent .sav WRITER exists in this container (pandas only reads
.sav via the absent pyreadstat), so these fixtures are authored
directly against the publicly documented system-file format (the PSPP
project's "System File Format" documentation). The spec-relevant
structure is kept deliberately explicit below so the fixture can be
audited section by section. Two variants: uncompressed (compression 0)
and simple-bytecode (compression 1) case data.

Columns: idx (numeric), score (numeric, one SYSMIS), name (string
width 16, UTF-8, long-name mapping via extension subtype 13).
"""
import os, struct, zlib

SYSMIS = struct.unpack("<d", struct.pack("<Q", 0xFFEFFFFFFFFFFFFF))[0]  # lowest finite double
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "spss")


def header(case_size, compression, ncases):
    rec = b"$FL3" if compression == 2 else b"$FL2"
    rec += "@(#) SPSS DATA FILE - graft spec fixture".ljust(60).encode()
    rec += struct.pack("<i", 2)            # layout code (endianness witness)
    rec += struct.pack("<i", case_size)    # elements per case
    rec += struct.pack("<i", compression)  # 0 raw / 1 bytecode
    rec += struct.pack("<i", 0)            # weight index: none
    rec += struct.pack("<i", ncases)
    rec += struct.pack("<d", 100.0)        # compression bias
    rec += b"01 Jan 26" + b"00:00:00"
    rec += "graft sav fixture".ljust(64).encode()
    rec += b"\x00\x00\x00"
    assert len(rec) == 176
    return rec


def var_record(tpe, name, fmt):
    rec = struct.pack("<iiiiii", 2, tpe, 0, 0, fmt, fmt)
    rec += name.ljust(8)[:8].encode()
    return rec


def continuation():
    return struct.pack("<iiiiii", 2, -1, 0, 0, 0, 0) + b" " * 8


def extension(subtype, payload):
    return struct.pack("<iiii", 7, subtype, 1, len(payload)) + payload


F8_2 = (5 << 16) | (8 << 8) | 2   # numeric F8.2
A16 = (1 << 16) | (16 << 8)       # string A16


def dictionary(compression, ncases):
    out = header(case_size=4, compression=compression, ncases=ncases)  # 1+1+2 elements
    out += var_record(0, "IDX", F8_2)
    out += var_record(0, "SCORE", F8_2)
    out += var_record(16, "NAME", A16)
    out += continuation()  # width 16 = 2 elements -> 1 continuation record
    out += extension(13, b"NAME=doc_name")             # long variable names
    out += extension(20, b"UTF-8")                     # character encoding
    out += struct.pack("<ii", 999, 0)                  # dictionary terminator
    return out


ROWS = [
    (1.0, 10.125, "alpha"),
    (2.0, None, "beta"),          # SYSMIS score
    (3.0, 0.0, ""),
    (4.0, 2.5, "épsilon"),        # multi-byte UTF-8 within fixed width
    (5.0, 90000000000.0, "last row"),
]


def str_elements(s):
    raw = s.encode("utf-8")
    assert len(raw) <= 16
    raw = raw.ljust(16)
    return [raw[0:8], raw[8:16]]


def raw_case_data():
    out = b""
    for idx, score, name in ROWS:
        out += struct.pack("<d", idx)
        out += struct.pack("<d", SYSMIS if score is None else score)
        for el in str_elements(name):
            out += el
    return out


def bytecode_case_data():
    # elements as (kind, value): kind num / sysmis / str
    elements = []
    for idx, score, name in ROWS:
        elements.append(("num", idx))
        elements.append(("sysmis", None) if score is None else ("num", score))
        for el in str_elements(name):
            elements.append(("str", el))
    elements.append(("end", None))

    out = b""
    cmds, lits = [], []

    def flush():
        nonlocal out, cmds, lits
        if not cmds:
            return
        while len(cmds) < 8:
            cmds.append(0)
        out += bytes(cmds) + b"".join(lits)
        cmds, lits = [], []

    for kind, val in elements:
        if len(cmds) == 8:
            flush()
        if kind == "end":
            cmds.append(252)
        elif kind == "sysmis":
            cmds.append(255)
        elif kind == "num" and val == int(val) and 1 <= val + 100 <= 251:
            cmds.append(int(val + 100))   # small integers ride in the command byte
        elif kind == "num":
            cmds.append(253)
            lits.append(struct.pack("<d", val))
        elif val == b"        ":
            cmds.append(254)              # all-spaces string element
        else:
            cmds.append(253)
            lits.append(val)
    flush()
    return out


def zsav_case_data(dict_len):
    # zheader (24B: self ofs, trailer ofs, trailer len) | zlib block |
    # trailer (bias, zero, block_size, n_blocks + one descriptor);
    # decompressed payload = the compression-1 bytecode stream verbatim
    bc = bytecode_case_data()
    comp = zlib.compress(bc)
    zheader_ofs = dict_len
    data_ofs = zheader_ofs + 24
    ztrailer_ofs = data_ofs + len(comp)
    out = struct.pack("<qqq", zheader_ofs, ztrailer_ofs, 24 + 24)
    out += comp
    out += struct.pack("<qqii", -100, 0, 0x3FF000, 1)
    out += struct.pack("<qqii", zheader_ofs, data_ofs, len(bc), len(comp))
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "sample_raw.sav"), "wb") as f:
        f.write(dictionary(0, len(ROWS)) + raw_case_data())
    with open(os.path.join(OUT, "sample_comp.sav"), "wb") as f:
        f.write(dictionary(1, len(ROWS)) + bytecode_case_data())
    zdict = dictionary(2, len(ROWS))
    with open(os.path.join(OUT, "sample.zsav"), "wb") as f:
        f.write(zdict + zsav_case_data(len(zdict)))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
