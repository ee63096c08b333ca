"""Recompute the like-for-like bench ledger from the checked-in artifacts.

The standing comparison method (BASELINE.md) is the common-query-subset
ratio: sum of per-query times over the queries two rounds share, newest /
oldest.  This script derives every BASELINE.md ratio row directly from the
`BENCH_r{N}.json` files so the table can never drift from the recorded
artifacts (VERDICT r5 item 3 — a quiet-machine run that isn't checked in
doesn't count).

Usage:
    python tools/bench_ratio.py              # ledger: every round vs r01 + prev
    python tools/bench_ratio.py r04 r05      # one pair, full per-query detail
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path: str) -> dict | None:
    """Parse a BENCH_r{N}.json — either our raw JSON line or the driver's
    wrapper with the JSON line inside a ``tail`` capture."""
    try:
        with open(path) as fh:
            d = json.load(fh)
    except (OSError, ValueError):
        return None
    if "queries" not in d and "tail" in d:
        at = d["tail"].rfind('{"metric"')
        if at >= 0:
            try:
                parsed, _ = json.JSONDecoder().raw_decode(d["tail"][at:])
                d = {**d, **parsed}
            except ValueError:
                pass
    if "queries" not in d and "tail" in d:
        # Front-truncated driver tail (r07): the '{"metric"' prefix was cut,
        # leaving a bare run of `"name": secs` pairs.  Recover what survived
        # with a regex and mark the round partial so ledger rows derived
        # from it say so.  A pair whose opening quote (or any of its name)
        # was cut — r07's leading `p3_filter_page": 0.224` fragment of
        # `p2_p3_filter_page` — has no `"name":` shape and is skipped by
        # the regex itself, so every match is a complete, trustworthy pair.
        # Anchor to the queries-object region when it survived the cut, so
        # numeric pairs nested in other structures (regressions blocks'
        # "base"/"now"/"ratio", future meta) can't masquerade as timings.
        tail = d["tail"]
        m = re.search(r'"queries"\s*:\s*\{', tail)
        if m:
            region = tail[m.end() :]
            end = region.find("}")
            tail = region[:end] if end >= 0 else region
        pairs = re.findall(r'"([A-Za-z_]\w*)":\s*(\d+(?:\.\d+)?)', tail)
        meta = {"metric", "value", "unit", "sf", "n", "rc", "cpus"}
        nested = {"base", "now", "ratio"}
        qs = [(k, float(v)) for k, v in pairs if k not in meta | nested]
        if qs:
            d = {**d, "queries": dict(qs), "partial": True}
    if d.get("partial"):
        # bench.py self-records its untruncated result (VERDICT r8 item 4).
        # If the self-record is the SAME run — every overlapping per-query
        # timing identical (both sides print round(x, 3)) — upgrade the
        # truncated record to the complete one.
        selfp = os.path.join(os.path.dirname(path) or ".", "BENCH_SELF_latest.json")
        try:
            with open(selfp) as fh:
                s = json.load(fh)
        except (OSError, ValueError):
            s = None
        if s and s.get("queries"):
            sq, dq = s["queries"], d["queries"]
            common = set(sq) & set(dq)
            sf_ok = d.get("sf") is None or d.get("sf") == s.get("sf")
            if common and sf_ok and all(
                abs(float(sq[q]) - float(dq[q])) < 1e-9 for q in common
            ):
                d = {**d, "queries": dict(sq), "partial": False,
                     "self_recorded": True}
                if "value" in s:
                    d["value"] = s["value"]
    return d if d.get("queries") else None


def rounds() -> dict[str, dict]:
    # BENCH_r{N}.json are the driver's sf0.1 records; BENCH_sf{S}_r{N}.json
    # are self-recorded full-suite runs at other scale factors (the sf1
    # decade artifact, VERDICT r8 item 1).  Ledger rows never compare
    # across scale factors.
    out = {}
    for f in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"BENCH_(r\d+|sf[0-9.]+_r\d+)\.json", f)
        if not m:
            continue
        d = load_bench(os.path.join(REPO, f))
        if d is not None:
            out[m.group(1)] = d
    return out


def like_for_like(now: dict, base: dict) -> tuple[int, float, float]:
    common = sorted(set(now["queries"]) & set(base["queries"]))
    return (
        len(common),
        round(sum(now["queries"][q] for q in common), 3),
        round(sum(base["queries"][q] for q in common), 3),
    )


def main() -> None:
    recorded = rounds()
    if len(sys.argv) == 3:
        a, b = sys.argv[1], sys.argv[2]
        base, now = recorded[a], recorded[b]
        if base.get("sf") != now.get("sf"):
            print(f"WARNING: cross-sf comparison ({base.get('sf')} vs "
                  f"{now.get('sf')}) — ratios are scale effects, not "
                  "regressions; use tools/sf1_exponents.py for decade math")
        common = sorted(set(now["queries"]) & set(base["queries"]))
        for q in common:
            t0, t1 = base["queries"][q], now["queries"][q]
            flag = "  <-- >2x" if t1 > 2 * t0 and t1 - t0 > 0.5 else ""
            print(f"{q:28s} {t0:7.3f} -> {t1:7.3f}  ({t1 / t0 if t0 else 0:5.2f}x){flag}")
        n, s_now, s_base = like_for_like(now, base)
        part = "" if not (now.get("partial") or base.get("partial")) else \
            "  [partial — some timings lost to driver tail truncation]"
        print(f"\n{b} vs {a}: {n} common, {s_now:.1f}s vs {s_base:.1f}s = "
              f"{s_now / s_base:.2f}x{part}")
        return

    names = sorted(recorded)
    first = names[0]
    print(f"{'round':6s} {'sf':5s} {'queries':>7s} {'total':>8s} "
          f"{'vs ' + first:>16s} {'vs prev':>16s}")
    prev = None
    for name in names:
        d = recorded[name]
        total = round(sum(d["queries"].values()), 2)
        cells = []
        for base_name in (first, prev):
            if (
                base_name is None
                or base_name == name
                or recorded[base_name].get("sf") != d.get("sf")
            ):
                cells.append("-")
                continue
            n, s_now, s_base = like_for_like(d, recorded[base_name])
            cells.append(f"{s_now / s_base:.2f}x ({n}q "
                         f"{s_now:.1f}/{s_base:.1f}s)" if s_base else "-")
        mark = "*" if d.get("partial") else " "
        print(f"{name:5s}{mark} {str(d.get('sf')):5s} {len(d['queries']):7d} "
              f"{total:8.2f} {cells[0]:>16s} {cells[1]:>16s}")
        prev = name


if __name__ == "__main__":
    main()
