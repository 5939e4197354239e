#!/usr/bin/env python
"""Pretty-print agent debug traces written by utils/debug_logger.py.

Reference analogue: tools/view_debug_logs.py shipped with the Rust
CodeGraph for its DebugLogger output.

Usage: python tools/view_debug_logs.py [path] [--kind tool_call]
Default path: $CODEGRAPH_DEBUG_LOG.
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("path", nargs="?",
                        default=os.environ.get("CODEGRAPH_DEBUG_LOG", ""))
    parser.add_argument("--kind", help="filter by record kind")
    parser.add_argument("--tail", type=int, default=0,
                        help="only the last N records")
    args = parser.parse_args()
    if not args.path or not os.path.exists(args.path):
        print("no debug log (set CODEGRAPH_DEBUG_LOG or pass a path)",
              file=sys.stderr)
        return 1
    records = []
    with open(args.path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if args.kind and rec.get("kind") != args.kind:
                continue
            records.append(rec)
    if args.tail:
        records = records[-args.tail:]
    for rec in records:
        ts = time.strftime("%H:%M:%S", time.localtime(rec.get("ts", 0)))
        kind = rec.get("kind", "?")
        if kind == "tool_call":
            print(f"[{ts}] TOOL {rec.get('tool')} "
                  f"params={json.dumps(rec.get('params', {}))}")
            print(f"         -> {rec.get('result', '')[:160]}")
        elif kind == "reasoning":
            print(f"[{ts}] THINK ({rec.get('agent')}): "
                  f"{rec.get('text', '')[:200]}")
        else:
            extra = {k: v for k, v in rec.items() if k not in ("ts", "kind")}
            print(f"[{ts}] {kind.upper()} {json.dumps(extra, default=str)[:200]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
