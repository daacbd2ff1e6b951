"""Apply the variance-aware decision rule to multi-seed quality groups.

NOTES.md round-4 ("The variance-aware quality decision rule"): compare
per-config MEDIANS over >= 3 seeds against a named control group; an
effect is REAL iff |delta of medians| exceeds 2x the control group's
own seed range (the measured noise scale of the regime). Verdicts
within 2x noise are PROVISIONAL; the 100-frame drift-shape run is the
tiebreaker.

Usage:
  python -m isogs_slam_tpu.tools.contracts --control silnorm \
      artifacts/r4s2 artifacts/r4s1
prints, for every other group, the ATE/PSNR deltas vs the control and a
verdict line:
  PASS        — no real degradation (|dATE| <= max(2x noise, rel_tol))
  FAIL        — real degradation beyond the contract margin
  PROVISIONAL — effect within 2x noise of the decidability edge
  IMPROVES    — really better than control
The default contract margin is 10% relative ATE (--rel-tol 0.10), the
round-3 fast-mode contract.
"""
from __future__ import annotations

import argparse
import statistics

from .seed_stats import ATE, PSNR, collect


def adjudicate(groups, control: str, rel_tol: float = 0.10,
               psnr_tol: float = 0.5):
    """Returns (noise, rows): noise = control 3-seed ATE range; rows =
    [(group, n, d_ate, d_psnr, verdict)] for every non-control group."""
    if control not in groups:
        raise SystemExit(f"control group {control!r} not found; have: "
                         f"{sorted(groups)}")
    ctrl = groups[control]
    c_ates = [r[1] for r in ctrl]
    c_psnr = [r[2] for r in ctrl]
    c_med = statistics.median(c_ates)
    noise = max(c_ates) - min(c_ates)
    margin = max(2.0 * noise, rel_tol * c_med)
    rows = []
    for g in sorted(groups):
        if g == control:
            continue
        rs = groups[g]
        ates = [r[1] for r in rs]
        psnrs = [r[2] for r in rs]
        d_ate = statistics.median(ates) - c_med
        d_psnr = statistics.median(psnrs) - statistics.median(c_psnr)
        if d_ate <= -2.0 * noise and len(rs) >= 2:
            verdict = "IMPROVES"
        elif d_ate <= margin and d_psnr >= -psnr_tol:
            # inside the contract; decidable only when the margin
            # clears the noise scale
            verdict = "PASS" if margin > 2.0 * noise else "PROVISIONAL"
        elif d_ate <= margin + 2.0 * noise:
            verdict = "PROVISIONAL"
        else:
            verdict = "FAIL"
        if len(rs) < 3 and verdict in ("PASS", "FAIL"):
            verdict += " (n<3)"
        rows.append((g, len(rs), d_ate, d_psnr, verdict))
    return c_med, noise, margin, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--control", required=True,
                    help="group name (seed-stripped) to compare against")
    ap.add_argument("--rel-tol", type=float, default=0.10,
                    help="relative ATE contract margin (default 10%%)")
    ap.add_argument("--psnr-tol", type=float, default=0.5,
                    help="allowed PSNR drop in dB (default 0.5)")
    args = ap.parse_args(argv)
    groups = collect(args.dirs)
    c_med, noise, margin, rows = adjudicate(
        groups, args.control, args.rel_tol, args.psnr_tol)
    print(f"control={args.control}: ATE median {c_med:.3f} cm, seed "
          f"range (noise) {noise:.3f} cm, contract margin "
          f"{margin:.3f} cm")
    print(f"{'config':<18} {'n':>2} {'dATE(cm)':>9} {'dPSNR':>7} verdict")
    for g, n, d_ate, d_psnr, verdict in rows:
        print(f"{g:<18} {n:>2} {d_ate:>+9.3f} {d_psnr:>+7.2f} {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
