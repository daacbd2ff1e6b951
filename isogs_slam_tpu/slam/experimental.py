"""Registry of ADJUDICATED-LOSER knobs (the `experimental` namespace).

Every knob here was measured on the real chip and LOST (slower, or
quality-harmful on sequences) under its documented conditions, but is
kept for unit-scene capabilities, future-toolchain A/Bs, or mechanism
re-tests under new evidence. Enabling one is a deliberate experiment:
the pipeline prints a loud [experimental] line with the measured verdict
so a config that flips one can never silently regress a production run.

NOTES.md is the source of truth for each verdict; do NOT re-try these
without new evidence (CLAUDE.md hard rule).
"""
from __future__ import annotations

# (section, key) -> (trigger, verdict) where trigger(value) says
# "the experimental path is enabled" and verdict is the measured result.
LOSERS = {
    ("mapping", "lazy_adam"): (
        lambda v: bool(v),
        "LOSES at sub>1 (NOTES r3s4: sub4@40 ATE 6.88 lazy vs 2.35 "
        "dense); visit-count Adam underfits exactly where the subset "
        "path is underfit. Keep dense Adam."),
    ("mapping", "vmap_bins"): (
        lambda v: bool(v),
        "LOSES on exact bench (NOTES r3s4: 0.8734 FPS vs 0.923 serial "
        "slot binnings)."),
    ("tracking", "early_stop_patience"): (
        lambda v: int(v or 0) > 0,
        "LOSES at full_res (NOTES r4s3, 3 seeds under silnorm: ATE median "
        "0.308 vs control 0.135 cm, PSNR -2.5 dB) while saving only "
        "2.8 of 40 iterations (7%) — the best-candidate metric's "
        "improvement tail is slow but real, and truncating it "
        "compounds into drift. Worthless savings at a real cost."),
    ("tracking", "fan_rounds"): (
        lambda v: int(v or 0) > 0,
        "HARMFUL on sequences (NOTES r3s2: full_res+fan3 ATE 3.64 vs "
        "~2.2 exact-regime) — descending the biased tracking loss "
        "absorbs map error into the pose (gauge drift). Unit-scene "
        "polish only (8.1 -> 3.5 mm single-frame)."),
    ("tracking", "gn_iters"): (
        lambda v: int(v or 0) > 0,
        "DEAD for sequence tracking (NOTES r2s8: gn3+eigencut+trust "
        "region ATE 25.75 cm, super-linear drift; r2s5: 73.4 cm "
        "unguarded). Unit-scene pose polish only."),
    ("raster", "tile_cull"): (
        lambda v: bool(v),
        "SLOWER than plain modes on the bench (NOTES r2s6: 1.37 vs "
        "1.50 FPS at sub4) — slot-compaction cost unpaid on isotropic "
        "post-densify scenes. Wins only on anisotropic flake scenes."),
    ("raster", "tight_rect"): (
        lambda v: bool(v),
        "SLOWER on the bench (NOTES r2s6: 1.37 vs 1.50 FPS); isect "
        "demand did not shrink at bench scale (util 1.011 either "
        "way). Wins only on flakes / post-opacity-reset regimes."),
}


def warn_experimental(config: dict) -> list[str]:
    """Print one loud line per enabled adjudicated-loser knob; returns
    the warning strings (for tests)."""
    warnings = []
    for (section, key), (trigger, verdict) in LOSERS.items():
        val = config.get(section, {}).get(key)
        if val is not None and trigger(val):
            msg = (f"[experimental] {section}.{key}={val!r} is an "
                   f"ADJUDICATED LOSER: {verdict}")
            print(msg, flush=True)
            warnings.append(msg)
    return warnings
