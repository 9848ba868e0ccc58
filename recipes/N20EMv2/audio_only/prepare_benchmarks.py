#!/usr/bin/env python3
"""MIR-ST500 benchmark prep from the N20EMv2 audio recipe directory.

The reference ships a byte-identical copy of ``MIR_ST500/
prepare_benchmarks.py`` here (``/root/reference/N20EMv2/audio_only/
prepare_benchmarks.py``) so the mix-train flow can prepare the MIR-ST500
CSVs (``mir_st500_train.csv``) next to the N20EMv2 ones. We reuse the
MIR_ST500 module instead of duplicating it; the CLI contract is the same.
"""
import os
import runpy
import sys

_MIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "MIR_ST500", "prepare_benchmarks.py")

# re-export the module API (prepare_frame_anno, prepare_csv_benchmarks, ...)
_ns = runpy.run_path(_MIR)
for _name, _val in _ns.items():
    if not _name.startswith("__") and _name not in ("main",):
        globals()[_name] = _val

if __name__ == "__main__":
    sys.argv[0] = _MIR
    runpy.run_path(_MIR, run_name="__main__")
