"""Summarize xprof traces captured by profile_cifar.py: aggregate TPU op
time by (source line, hlo category), print top entries and a side-by-side
variant comparison.

Usage: python scripts/trace_summary.py /tmp/xprof_w8a8_sym /tmp/xprof_wonly ...
"""

import collections
import gzip
import json
import os
import sys


def load(outdir):
    base = os.path.join(outdir, "plugins/profile")
    sess = sorted(os.listdir(base))[-1]
    p = [f for f in os.listdir(os.path.join(base, sess))
         if f.endswith(".trace.json.gz")][0]
    ev = json.load(gzip.open(os.path.join(base, sess, p)))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    rows = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or pids.get(e.get("pid")) != "/device:TPU:0":
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        if cat in ("while", "?"):
            continue
        src = a.get("source", "?").split("/")[-1]
        rows[(src, cat)] += e.get("dur", 0)
    return rows


def main():
    dirs = sys.argv[1:]
    tables = {d: load(d) for d in dirs}
    keys = set()
    for t in tables.values():
        keys |= set(t)
    tot = {d: sum(t.values()) for d, t in tables.items()}
    print(f"{'source':<42}{'category':<22}" +
          "".join(f"{os.path.basename(d):>16}" for d in dirs))
    print(f"{'TOTAL device us':<64}" +
          "".join(f"{tot[d]:>16.0f}" for d in dirs))
    for key in sorted(keys, key=lambda k: -max(
            t.get(k, 0) for t in tables.values()))[:28]:
        src, cat = key
        print(f"{src:<42}{cat:<22}" +
              "".join(f"{tables[d].get(key, 0):>16.0f}" for d in dirs))


if __name__ == "__main__":
    main()
