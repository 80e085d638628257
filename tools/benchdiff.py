#!/usr/bin/env python3
"""Cross-round per-query bench diff over BENCHFULL_r{N}.json artifacts.

Implements BASELINE.md's "Full per-query record (comparison rule)":
both sides are normalized by their calibration factor
(min(calib_sec)/0.220) and compared over the FULL key set; movers past
the threshold (default 20%) print with their absolute deltas. Refuses
partial boards ("only" field) and warns when either side's brackets
disagree >10% (per the bracket-agreement doctrine the normalization is
then untrustworthy). calib_mc_sec, when present on both sides, is
reported so parallel-CPU movers can be read against the multi-core
probe (BASELINE.md "Multi-core sustained probe").

MEDIAN-RATIO normalization (r17): when the hardware changes between
rounds (r16 -> r17 the sandbox got 2-3x faster and the 400M short
probe became overhead-dominated, see "calib floor" in BASELINE.md),
the probe factor stops being a trustworthy normalizer. The robust
alternative reported alongside: the MEDIAN of per-query raw ratios
new/old over the common set (queries >= 0.15 s on both sides) is the
empirical machine factor — by construction at least half the board
moved with it, so drift is then judged as deviation from that median.
Movers are reported under BOTH normalizations; a mover under one but
not the other is machine-regime sensitivity, not a code regression.

Usage: benchdiff.py OLD.json NEW.json [threshold_pct]
"""
import json
import sys

REF = 0.220


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    if d.get("only"):
        sys.exit(f"{path} is a dev-filtered partial board (only={d['only']}) - never compare")
    cal = d["calib_sec"]
    spread = abs(cal[0] - cal[1]) / min(cal)
    if spread > 0.10:
        print(f"WARNING {path}: calib brackets {cal} disagree {spread:.0%} - normalization untrustworthy")
    mc = d.get("calib_mc_sec")
    if mc and min(mc) > 0:
        mcs = abs(mc[0] - mc[1]) / min(mc)
        if mcs > 0.10:
            print(f"WARNING {path}: calib_mc brackets {mc} disagree {mcs:.0%}")
    return d


def movers_table(title, qo, qn, common, thr):
    movers = []
    for k in common:
        a, b = qo[k], qn[k]
        if max(a, b) < 0.15:  # sub-150ms: pure noise floor
            continue
        rel = (b - a) / a
        if abs(rel) >= thr:
            movers.append((rel, k, a, b))
    movers.sort(reverse=True)
    if movers:
        print(f"\n{title} movers >{thr:.0%} (old -> new):")
        for rel, k, a, b in movers:
            print(f"  {k:<28} {a:7.3f} -> {b:7.3f}  ({rel:+.0%})")
    else:
        print(f"\n{title}: no movers past {thr:.0%}")
    return {k for _, k, _, _ in movers}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.20
    fo, fn = min(old["calib_sec"]) / REF, min(new["calib_sec"]) / REF
    ro = {k: v for k, v in old["queries"].items() if v >= 0}
    rn = {k: v for k, v in new["queries"].items() if v >= 0}
    common = sorted(set(ro) & set(rn))
    added = sorted(set(rn) - set(ro))
    removed = sorted(set(ro) - set(rn))
    print(f"old: {len(ro)} keys, factor {fo:.2f} (calib {old['calib_sec']}, mc {old.get('calib_mc_sec')})")
    print(f"new: {len(rn)} keys, factor {fn:.2f} (calib {new['calib_sec']}, mc {new.get('calib_mc_sec')})")

    # probe-factor normalization (the original rule)
    qo = {k: v / fo for k, v in ro.items()}
    qn = {k: v / fn for k, v in rn.items()}
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"common set ({len(common)}): {so:.1f} -> {sn:.1f} s probe-normalized ({(sn - so) / so:+.1%})")

    # median-ratio normalization (r17 rule for hardware changes)
    ratios = sorted(rn[k] / ro[k] for k in common
                    if ro[k] >= 0.15 and rn[k] >= 0.15)
    if ratios:
        med = ratios[len(ratios) // 2]
        print(f"median per-query raw ratio new/old: {med:.3f} "
              f"(over {len(ratios)} queries >=0.15s; probe factors imply {fn / fo:.3f})")
        mo = {k: v for k, v in ro.items()}
        mn = {k: v / med for k, v in rn.items()}
        a = movers_table("probe-normalized", qo, qn, common, thr)
        b = movers_table("median-normalized", mo, mn, common, thr)
        both = sorted(a & b)
        if both:
            print(f"\nmovers under BOTH normalizations ({len(both)}): {', '.join(both)}")
        else:
            print("\nno query moves under both normalizations")
    else:
        movers_table("probe-normalized", qo, qn, common, thr)

    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{k}={rn[k]:.2f}s raw" for k in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
