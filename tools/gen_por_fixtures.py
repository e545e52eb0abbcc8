#!/usr/bin/env python3
"""Generate an SPSS portable (.por) test fixture for PorScanSpec.

No second .por implementation exists in this container (pandas cannot
read portables), so the fixture is authored directly against the
public PSPP "Portable File Format" documentation, section by section,
mirroring what tools/gen_sav_fixtures.py does for .sav.

Columns: IDX numeric, SCORE numeric (one SYSMIS), NAME string(12).
Values are chosen dyadic so base-30 round-trips are bit-exact.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "spss")

DIGITS = "0123456789ABCDEFGHIJKLMNOPQRST"

ROWS = [
    (1.0, 10.125, "alpha"),
    (2.0, None, "beta"),
    (3.0, -7.25, ""),
    (4.0, 2.5, "delta row"),
    (5.0, 90000000000.0, "final row!"),
]


def base30_int(n):
    assert n == int(n) and n >= 0
    n = int(n)
    if n == 0:
        return "0"
    out = ""
    while n:
        out = DIGITS[n % 30] + out
        n //= 30
    return out


def number(x):
    """base-30 number field, '/'-terminated; exact for dyadic values
    whose fraction terminates in base 30 (all of ROWS do)."""
    if x is None:
        return "*."
    s = "-" if x < 0 else ""
    x = abs(x)
    ip = int(x)
    frac = x - ip
    out = s + base30_int(ip)
    if frac:
        ds = ""
        # dyadic fractions terminate: 1/2 = F/30, 1/4 = 7F/900, ...
        for _ in range(12):
            frac *= 30
            d = int(frac)
            ds += DIGITS[d]
            frac -= d
            if frac == 0:
                break
        assert frac == 0, "fixture value must terminate in base 30"
        out += "." + ds
    return out + "/"


def string(s):
    return number(len(s)) + s


def build():
    out = []
    for i in range(5):  # 200-byte splash: 5 x 40 chars
        out.append(f"graft spss portable fixture line {i}".ljust(40)[:40])
    # 256-byte translation table: ASCII identity for the printable
    # range (readers verify it maps the signature to SPSSPORT)
    out.append("".join(chr(c) if 32 <= c < 127 else "0" for c in range(256)))
    out.append("SPSSPORT")
    out.append("A" + "20260813" + "020000")
    out.append("1" + string("graft fixture writer"))
    out.append("4" + number(3) + "5" + number(11))
    fmt = number(5) + number(8) + number(2)   # F8.2-ish, reader skips
    afmt = number(1) + number(12) + number(0)  # A12
    out.append("7" + number(0) + string("IDX") + fmt + fmt)
    out.append("7" + number(0) + string("SCORE") + fmt + fmt)
    out.append("7" + number(12) + string("NAME") + afmt + afmt)
    out.append("F")
    for idx, score, name in ROWS:
        out.append(number(idx) + number(score) + string(name))
    blob = "".join(out)
    blob += "Z" * ((-len(blob)) % 80 or 80)
    # split into 80-char physical lines with \r\n, like real writers
    lines = [blob[i:i + 80] for i in range(0, len(blob), 80)]
    return ("\r\n".join(lines) + "\r\n").encode("ascii")


def main():
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "sample.por")
    with open(path, "wb") as f:
        f.write(build())
    print("wrote", path)


if __name__ == "__main__":
    main()
