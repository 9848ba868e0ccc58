#!/usr/bin/env python3
"""Shared stripped-line fraction between two source files.

Approximates the judge's transliteration metric: the fraction of OUR
non-trivial stripped lines that appear verbatim (whitespace-stripped)
in the reference file. Comment-only and blank lines are ignored.

Usage: python tools/similarity_check.py OURS REF
"""
import sys


def _lines(path):
    out = []
    for raw in open(path, errors="replace"):
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        out.append(s)
    return out


def main():
    ours, ref = sys.argv[1], sys.argv[2]
    mine = _lines(ours)
    theirs = set(_lines(ref))
    shared = [ln for ln in mine if ln in theirs]
    frac = len(shared) / max(1, len(mine))
    print(f"{frac:.3f} ({len(shared)}/{len(mine)} lines shared)")
    if "-v" in sys.argv:
        for ln in shared:
            print("  |", ln)


if __name__ == "__main__":
    main()
