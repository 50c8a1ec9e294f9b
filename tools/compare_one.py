#!/usr/bin/env python3
"""Per-query oracle compare with a timeout per query — for probing which
oracles are DuckDB-expensive at larger SFs (the Spark side is already
dumped). Usage: python3 tools/compare_one.py <sfdir> <outdir> [timeout_s]
Writes progress to <outdir>_done.json and restores oracle_sql.json."""
import sys, json, subprocess, os

def main(sfdir, outdir, timeout_s=120):
    oracle_path = f"{outdir}/oracle_sql.json"
    oracle = json.load(open(oracle_path))
    done_f = f"{outdir}_done.json"
    done = json.load(open(done_f)) if os.path.exists(done_f) else {}
    try:
        for name in sorted(oracle):
            if name in done:
                continue
            json.dump({name: oracle[name]}, open(oracle_path, "w"))
            try:
                r = subprocess.run(
                    ["python3", os.path.join(os.path.dirname(__file__), "compare_oracle.py"),
                     sfdir, outdir],
                    capture_output=True, text=True, timeout=timeout_s)
                line = [l for l in r.stdout.splitlines()
                        if l.startswith(("OK", "VALUES", "ROWCOUNT", "SCHEMA", "ORACLE", "SPARK", "MISSING"))]
                done[name] = line[0] if line else r.stdout.strip()[-200:]
            except subprocess.TimeoutExpired:
                done[name] = f"TIMEOUT>{timeout_s}s (oracle too slow in DuckDB at this SF; not a Spark-side issue)"
            json.dump(done, open(done_f, "w"))
            print(done[name], flush=True)
    finally:
        json.dump(oracle, open(oracle_path, "w"))
    bad = [n for n, v in done.items() if not (v.startswith("OK") or v.startswith("TIMEOUT"))]
    print(f"\n{len(done)} compared, {len(bad)} bad, "
          f"{sum(1 for v in done.values() if v.startswith('TIMEOUT'))} timeout")
    return 1 if bad else 0

if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    sys.exit(main(sys.argv[1], sys.argv[2], t))
