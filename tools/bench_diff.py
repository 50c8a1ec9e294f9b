#!/usr/bin/env python3
"""Cross-round bench comparison with dispersion-aware flagging.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [--threshold-pct 15]

Reads two graft.Bench artifacts (bench_out.json or a BENCH_r*.json whose
per-query map survived) and reports per-query deltas on the shared set.
A delta only FLAGS as a regression/improvement when it exceeds both the
threshold and the run's own measured dispersion for that query (isolated
disp_pct when the query is in the isolated block, else the run-level
spread_med_pct) — the round-6/7 lesson: min-only cross-round deltas under
the host's run-to-run spread are unreadable and burn judging cycles.

Prefers isolated minimums (the per-query number of record) over in-suite
minimums when both artifacts carry them for a query.
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read().strip()
    d = json.loads(text)
    # BENCH_r*.json driver artifacts wrap the bench line: prefer a parsed
    # dict, else fish the LAST {"metric":... line out of the raw tail
    # (the tail's front may be log chatter or a truncated earlier line)
    if "queries" not in d and "isolated" not in d:
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        elif isinstance(d.get("tail"), str):
            tail = d["tail"]
            lines = [ln for ln in tail.splitlines()
                     if ln.startswith('{"metric"')]
            # Bench prints the query-less MINIMAL summary line LAST; the
            # per-query line sits above it. Prefer the last parseable line
            # that actually carries a "queries"/"isolated" map — falling
            # back to the minimal line only when no richer line survived
            # (totals-only: the diff then reports no shared queries).
            recovered = None
            fallback = None
            for ln in reversed(lines):
                try:
                    cand = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if "queries" in cand or "isolated" in cand:
                    recovered = cand
                    break
                if fallback is None:
                    fallback = cand
            if recovered is None:
                recovered = fallback
            if recovered is None or "queries" not in recovered:
                # the per-query line was front-truncated (the BENCH_r10
                # failure mode — and with the minimal-line format the
                # salvaged fallback is query-less too): regex the maps
                # out of the raw tail and graft them onto whatever
                # summary line survived
                import re
                m = re.search(r'"queries":(\{[^{}]*\})', tail)
                iso = re.search(r'"isolated":(\{.*?\}\})', tail)
                s = re.search(r'"spread_med_pct":([0-9.]+)', tail)
                if m or iso:
                    recovered = dict(recovered or {})
                    if m:
                        recovered["queries"] = json.loads(m.group(1))
                    if iso:
                        try:
                            recovered["isolated"] = json.loads(iso.group(1))
                        except json.JSONDecodeError:
                            pass
                    if s and "spread_med_pct" not in recovered:
                        recovered["spread_med_pct"] = float(s.group(1))
            if recovered is not None:
                d = recovered
    if "queries" not in d and "isolated" not in d and d.get("detail_file"):
        # the minimal summary line carries no per-query map by design —
        # it NAMES the durable full-map artifact instead. Follow it
        # (relative to the BENCH file) when its total matches exactly,
        # so a detail file from a DIFFERENT run can't masquerade.
        import os
        detail = os.path.join(os.path.dirname(os.path.abspath(path)),
                              d["detail_file"])
        if os.path.exists(detail):
            try:
                with open(detail) as f:
                    dd = json.loads(f.read().strip())
                if dd.get("value") == d.get("value"):
                    d = dd
            except (json.JSONDecodeError, OSError):
                pass
    return d


def numbers(d):
    """short-name -> (seconds, dispersion_pct, source, full-name).

    Keys normalize to the pre-underscore prefix: the stdout/driver line
    uses short names (q01) while bench_out.json uses full ones
    (q01_agg_pricing)."""
    out = {}
    spread = d.get("spread_med_pct", 50.0)
    for name, sec in (d.get("queries") or {}).items():
        out[name.split("_")[0]] = (sec, spread, "suite", name)
    for name, rec in (d.get("isolated") or {}).items():
        disp = rec.get("disp_pct", rec.get("spread_pct", spread))
        out[name.split("_")[0]] = (rec["min"], max(disp, 1.0), "isolated", name)
    return out


def main(old_path, new_path, threshold_pct=15.0):
    old, new = numbers(load(old_path)), numbers(load(new_path))
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries between the two artifacts")
        return 1
    flags = []
    total_old = total_new = 0.0
    for n in shared:
        (o, odisp, _, _), (v, ndisp, src, full) = old[n], new[n]
        total_old += o
        total_new += v
        delta_pct = 100.0 * (v - o) / o if o > 0 else 0.0
        # readable only when the delta clears BOTH runs' self-measured noise
        noise = max(odisp, ndisp, threshold_pct)
        if abs(delta_pct) > noise:
            flags.append((full, o, v, delta_pct, noise, src))
    print(f"shared queries: {len(shared)}  "
          f"total {total_old:.2f}s -> {total_new:.2f}s "
          f"({100.0 * (total_new - total_old) / total_old:+.1f}%)")
    if not flags:
        print(f"no per-query delta clears its noise floor "
              f"(threshold {threshold_pct}%, per-query dispersion-aware)")
        return 0
    print(f"{len(flags)} attributable deltas (|delta| > max(disp, "
          f"{threshold_pct}%)):")
    for n, o, v, dp, noise, src in sorted(flags, key=lambda x: -abs(x[3])):
        kind = "REGRESSION " if dp > 0 else "IMPROVEMENT"
        print(f"  {kind} {n:30s} {o:7.3f}s -> {v:7.3f}s "
              f"({dp:+6.1f}%, noise floor {noise:.1f}%, {src})")
    return 0


if __name__ == "__main__":
    # accept both `--threshold-pct=15` and `--threshold-pct 15`; anything
    # else non-flag beyond the two paths is an error, not a silent ignore
    argv = sys.argv[1:]
    paths = []
    thr = 15.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold-pct"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    sys.exit("--threshold-pct needs a value")
                thr = float(argv[i])
        elif a.startswith("--"):
            sys.exit(f"unknown flag: {a}")
        else:
            paths.append(a)
        i += 1
    if len(paths) != 2:
        sys.exit("usage: bench_diff.py <old.json> <new.json> "
                 "[--threshold-pct 15]")
    sys.exit(main(paths[0], paths[1], thr))
