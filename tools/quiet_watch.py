#!/usr/bin/env python3
"""Quiet-window certification watcher.

Polls the host-interference gauge; when a quiet slice appears (single_s
near the quiet reference and most cores effective), immediately runs the
single-thread kernel bench (and optionally the media bench) and appends
the JSON to a log. Exits after `max_minutes` or after `hits` successful
quiet-window captures.

Usage: python tools/quiet_watch.py [max_minutes] [hits] [logfile]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 120
    want_hits = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    log = sys.argv[3] if len(sys.argv) > 3 else "/tmp/quiet_watch.jsonl"
    from bench import host_gauge

    t_end = time.time() + max_minutes * 60
    hits = 0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    while time.time() < t_end and hits < want_hits:
        g = host_gauge()
        line = {"t": time.strftime("%H:%M:%S"), "gauge": g}
        if g["single_s"] <= 0.295 and g["effective_cores"] >= 12.0:
            r = subprocess.run(
                [sys.executable, os.path.join(root, "tools", "kernel_bench.py"), "0.3", "5"],
                capture_output=True, text=True, timeout=900,
            )
            tail = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            line["kernel"] = json.loads(tail[-1]) if tail else {"rc": r.returncode}
            line["gauge_after"] = host_gauge()
            hits += 1
        with open(log, "a") as fh:
            fh.write(json.dumps(line) + "\n")
        if hits < want_hits:
            time.sleep(240)
    print(json.dumps({"hits": hits, "log": log}))


if __name__ == "__main__":
    main()
