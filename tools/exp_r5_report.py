"""Summarize exp_r5_harness logs: per-arm best/median by band.

Usage: python3 tools/exp_r5_report.py < /tmp/r5h.log
       (or pipe only the '"ev": "m"' lines — both work)
"""

import json
import statistics
import sys


def main():
    rows = []
    for line in sys.stdin:
        try:
            d = json.loads(line)
        except Exception:
            continue
        if d.get("ev") == "m":
            rows.append(d)
    if not rows:
        print("no measurement rows on stdin")
        return
    arms = sorted(k for k in rows[0] if k.startswith(("h_", "s_")))
    for band in ("HEALTHY", "MIDGRADE"):
        sel = [r for r in rows if r.get("band") == band]
        if not sel:
            continue
        print(f"{band} ({len(sel)} rounds)")
        print(f"  {'arm':<12}{'best ms':>9}{'median ms':>11}{'n':>4}")
        for a in arms:
            vals = [r[a] for r in sel if a in r]
            if vals:
                print(f"  {a:<12}{min(vals):>9.3f}"
                      f"{statistics.median(vals):>11.3f}{len(vals):>4}")


if __name__ == "__main__":
    main()
