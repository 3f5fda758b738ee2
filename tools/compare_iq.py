#!/usr/bin/env python3
"""Compare two gpssim.bin IQ streams; print a JSON error histogram.

Python front end over the same thresholds as the C++ `iqcompare` tool
(build with `make -C tools`); use either. Exit 0 = pass.

Usage: compare_iq.py <file_a> <file_b> [--bits 1|8|16]
                     [--max-frac 1e-4] [--max-delta 4] [--max-big 2]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load(path: str, bits: int) -> np.ndarray:
    if bits == 16:
        return np.fromfile(path, np.int16).astype(np.int32)
    if bits == 8:
        return np.fromfile(path, np.int8).astype(np.int32)
    if bits == 1:
        b = np.unpackbits(np.fromfile(path, np.uint8))
        return b.astype(np.int32) * 2 - 1
    raise ValueError(f"bad bits: {bits}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("file_a")
    ap.add_argument("file_b")
    ap.add_argument("--bits", type=int, default=16, choices=(1, 8, 16))
    ap.add_argument("--max-frac", type=float, default=1e-4,
                    help="max fraction of mismatching samples")
    ap.add_argument("--max-delta", type=int, default=4,
                    help="max |error| in LSB")
    ap.add_argument("--max-big", type=int, default=-1,
                    help="samples allowed above max-delta (default: scales "
                         "with length, 2 + 1 per 25M values — isolated "
                         "chip-boundary flips from the oracle's f64-NCO "
                         "accumulation occur at roughly that rate)")
    ns = ap.parse_args()

    a, b = load(ns.file_a, ns.bits), load(ns.file_b, ns.bits)
    n = min(len(a), len(b))
    size_mismatch = len(a) != len(b)
    d = np.abs(a[:n] - b[:n])
    mism = int(np.count_nonzero(d))
    max_delta = int(d.max()) if n else 0
    big = int(np.count_nonzero(d > ns.max_delta))
    hist = np.bincount(np.minimum(d, 16), minlength=17)

    max_big = ns.max_big if ns.max_big >= 0 else 2 + n // 25_000_000
    ok = (not size_mismatch and mism / max(n, 1) <= ns.max_frac
          and big <= max_big)
    print(json.dumps({
        "samples": n, "mismatches": mism,
        "fraction": round(mism / max(n, 1), 9), "max_delta": max_delta,
        "big": big, "size_mismatch": size_mismatch,
        "hist": hist.tolist(), "pass": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
