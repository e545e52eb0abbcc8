#!/usr/bin/env python3
"""Generate a SAS XPORT v5 (.xpt) test fixture for XptScanSpec.

The file is authored against the public spec (SAS Technical Note
TS-140) and then CROSS-VALIDATED by pandas' independent XPORT reader
(pandas.read_sas) before being written — generation fails if pandas
disagrees with the intended values, so the fixture pins the spec
interpretation against a second implementation.

Columns: IDX (numeric len 8), SCORE (numeric len 8, one '.' missing),
SHORTN (numeric len 4 — truncated IBM float), NAME (char len 12).
"""
import math, os, struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "xpt")

# Row layout constraints, learned from pandas' XPORT reader (the
# cross-validator): its record-count heuristic treats ANY aligned
# all-space 8-byte word in the LAST 80-byte record as tail padding, so
# the empty string and short names live in early rows; and it decodes
# IBM true zero as ~5.4e-79 (quirk), so zeros are tolerance-checked.
ROWS = [
    (1.0, 10.125, 1.5, ""),
    (2.0, None, 0.0, "beta"),
    (3.0, -7.25, 0.25, "midrowname"),
    (4.0, 2.5, 1024.0, "delta row"),
    (5.0, 90000000000.0, -0.5, "final row 5!"),
]


def ibm(x, length=8):
    """IEEE double -> IBM System/370 hex float, truncated to `length`."""
    if x == 0:
        return b"\x00" * length
    sign = 0x80 if x < 0 else 0
    x = abs(x)
    m2, e2 = math.frexp(x)          # x = m2 * 2**e2, m2 in [0.5, 1)
    e16 = math.ceil(e2 / 4)         # base-16 exponent
    shift = 4 * e16 - e2            # 0..3
    m16 = m2 / (2 ** shift)         # in [1/16, 1)
    frac = round(m16 * (1 << 56))
    if frac == 1 << 56:             # rounding overflow
        frac >>= 4
        e16 += 1
    full = bytes([sign | (e16 + 64)]) + frac.to_bytes(7, "big")
    return full[:length]


def missing():
    return b"." + b"\x00" * 7


def rec80(s):
    assert len(s) <= 80
    return s.ljust(80).encode("ascii")


def namestr(ntype, nlng, varnum, name, npos):
    out = struct.pack(">hhhh", ntype, 0, nlng, varnum)
    out += name.ljust(8)[:8].encode()
    out += b" " * 40                      # label
    out += b" " * 8                       # format name
    out += struct.pack(">hhh", 0, 0, 0)   # nfl, nfd, nfj
    out += b"  "                          # nfill
    out += b" " * 8                       # informat
    out += struct.pack(">hh", 0, 0)
    out += struct.pack(">i", npos)
    out += b" " * 52
    assert len(out) == 140
    return out


def build():
    recs = []
    recs.append(rec80("HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!"
                      "000000000000000000000000000000"))
    recs.append(rec80("SAS     SAS     SASLIB  6.06    bsd4.2  "
                      "                        13AUG26:01:02:03"))
    recs.append(rec80("13AUG26:01:02:03"))
    recs.append(rec80("HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
                      "000000000000000001600000000140"))
    recs.append(rec80("HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!"
                      "000000000000000000000000000000"))
    recs.append(rec80("SAS     GRAFT   SASDATA 6.06    bsd4.2  "
                      "                        13AUG26:01:02:03"))
    recs.append(rec80("13AUG26:01:02:03" + " " * 16 + "graft xpt fixture"))
    recs.append(rec80("HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
                      "000000" + "0004" + "0" * 20))
    ns = (namestr(1, 8, 1, "IDX", 0) +
          namestr(1, 8, 2, "SCORE", 8) +
          namestr(1, 4, 3, "SHORTN", 16) +
          namestr(2, 12, 4, "NAME", 20))
    pad = (-len(ns)) % 80
    ns += b" " * pad
    recs.append(ns)
    recs.append(rec80("HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"
                      "000000000000000000000000000000"))
    data = b""
    for idx, score, shortn, name in ROWS:
        data += ibm(idx)
        data += missing() if score is None else ibm(score)
        data += ibm(shortn, 4)
        data += name.ljust(12)[:12].encode("ascii")
    data += b" " * ((-len(data)) % 80)
    return b"".join(recs) + data


def main():
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "sample_v5.xpt")
    blob = build()
    with open(path, "wb") as f:
        f.write(blob)

    # cross-validate with pandas' independent XPORT reader
    import pandas as pd
    df = pd.read_sas(path, format="xport")
    assert list(df.columns) == ["IDX", "SCORE", "SHORTN", "NAME"], df.columns
    assert list(df["IDX"]) == [1.0, 2.0, 3.0, 4.0, 5.0], list(df["IDX"])
    assert math.isnan(df["SCORE"][1])
    assert list(df["SCORE"][[0, 2, 3, 4]]) == [10.125, -7.25, 2.5, 9e10], list(df["SCORE"])
    got = list(df["SHORTN"])
    assert got[0] == 1.5 and abs(got[1]) < 1e-70 and got[2:] == [0.25, 1024.0, -0.5], got
    names = [x.decode() if isinstance(x, bytes) else x for x in df["NAME"]]
    assert names == ["", "beta", "midrowname", "delta row", "final row 5!"], names
    print("pandas cross-validation OK; wrote", path)


if __name__ == "__main__":
    main()
