"""Summarize /tmp/r3_campaign.log bench sweep lines into a ranked table.

Usage: python scripts/summarize_campaign.py [logfile]
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_campaign.log"
    rows = []
    for line in open(path):
        line = line.strip()
        if not line.startswith('{"tag"'):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        r = d.get("result") or {}
        rows.append((
            d["tag"], d.get("exit"), r.get("metric", "-"),
            r.get("value", 0.0), r.get("vs_baseline", 0.0),
            r.get("error", ""),
        ))
    rows.sort(key=lambda t: -(t[3] or 0.0))
    w = max((len(r[0]) for r in rows), default=8)
    print(f"{'tag':<{w}}  {'value':>8}  {'vs_base':>8}  metric/error")
    for tag, code, metric, val, vs, err in rows:
        note = err or metric
        print(f"{tag:<{w}}  {val:>8.4f}  {vs:>8.4f}  {note}"
              + (f"  [exit {code}]" if code else ""))


if __name__ == "__main__":
    main()
