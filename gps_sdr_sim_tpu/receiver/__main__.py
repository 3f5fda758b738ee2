"""Receiver CLI: acquire, track, and decode a gpssim.bin file.

The software analogue of the reference's receiver-screenshot validation
(u-center.png / rtk/ — SURVEY.md §4): point it at a synthesized capture and
it prints the acquired channels and the decoded nav-message TOW/week.

Usage:
  python -m gps_sdr_sim_tpu.receiver <iq_file> [-s freq] [-b 1|8|16]
                                     [-d seconds] [--track seconds]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gps-sdr-rx")
    ap.add_argument("file")
    ap.add_argument("-s", type=float, default=2.6e6, dest="samp_freq")
    ap.add_argument("-b", type=int, default=16, dest="bits",
                    choices=(1, 8, 16))
    ap.add_argument("-d", type=float, default=0.1, dest="acq_seconds",
                    help="seconds of signal for acquisition")
    ap.add_argument("--track", type=float, default=0.0, metavar="SECONDS",
                    help="track + decode this many seconds")
    ap.add_argument("--dopp-step", type=float, default=50.0)
    ns = ap.parse_args(argv)

    from gps_sdr_sim_tpu.receiver import (acquire, bit_sync, decode_bits,
                                          frame_sync, load_iq, track)

    n = int(max(ns.acq_seconds, ns.track) * ns.samp_freq)
    x = load_iq(ns.file, ns.bits, count=n)
    print(f"loaded {len(x):,} samples ({len(x) / ns.samp_freq:.2f} s)",
          file=sys.stderr)

    acq = acquire(x, ns.samp_freq, dopp_step=ns.dopp_step)
    print("PRN  doppler[Hz]  code_phase[samp]  metric")
    for a in acq:
        if a.detected:
            print(f"{a.prn:3d}  {a.doppler:+10.1f}  {a.code_phase:15.1f}"
                  f"  {a.metric:7.1f}")

    if ns.track > 0:
        res = track(x, ns.samp_freq, acq)
        print("\nPRN  doppler[Hz]  subframes  TOW[s]        week")
        for c, prn in enumerate(res.prns):
            p = res.prompt[:, c]
            off = bit_sync(p)
            bits = decode_bits(p, off)
            sbfs = frame_sync(bits)
            tows = ",".join(f"{s.tow_sec:.0f}" for s in sbfs) or "-"
            weeks = ",".join(str(s.week) for s in sbfs
                             if s.week is not None) or "-"
            print(f"{prn:3d}  {res.doppler[-1, c]:+10.1f}  {len(sbfs):9d}"
                  f"  {tows:12s}  {weeks}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
