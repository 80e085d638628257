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


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.20
    fo, fn = min(old["calib_sec"]) / REF, min(new["calib_sec"]) / REF
    qo = {k: v / fo for k, v in old["queries"].items() if v >= 0}
    qn = {k: v / fn for k, v in new["queries"].items() if v >= 0}
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    print(f"old: {len(qo)} keys, factor {fo:.2f} (calib {old['calib_sec']}, mc {old.get('calib_mc_sec')})")
    print(f"new: {len(qn)} keys, factor {fn:.2f} (calib {new['calib_sec']}, mc {new.get('calib_mc_sec')})")
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    print(f"common set ({len(common)}): {so:.1f} -> {sn:.1f} s normalized ({(sn - so) / so:+.1%})")
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
        print(f"\nmovers >{thr:.0%} (normalized s, old -> new):")
        for rel, k, a, b in movers:
            print(f"  {k:<28} {a:7.3f} -> {b:7.3f}  ({rel:+.0%})")
    else:
        print(f"\nno movers past {thr:.0%}")
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{k}={qn[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
