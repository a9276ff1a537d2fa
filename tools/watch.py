"""Live-reload dev loop — the reference's ``make watch-*`` analogue.

The reference re-renders on every source save via ``entr`` and displays
the PPM with ``feh`` (reference Makefile:16-21).  Neither tool exists in
this image (and there is no display), so this is a self-contained
polling watcher: whenever any tracked source file's mtime changes, it
re-renders the configured scene to the output path and prints the wall
time, giving the same save-render-eyeball loop against any image viewer
pointed at the output file.

Usage:  python tools/watch.py [-- <extra rtow_tpu CLI args>]
        make watch
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCH_DIRS = [os.path.join(REPO, "rtow_tpu")]


def snapshot() -> dict:
    state = {}
    for root_dir in WATCH_DIRS:
        for root, _dirs, files in os.walk(root_dir):
            for f in files:
                if f.endswith((".py", ".cpp", ".h")):
                    p = os.path.join(root, f)
                    try:
                        state[p] = os.stat(p).st_mtime_ns
                    except OSError:
                        pass
    return state


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", default="/tmp/watch.ppm",
                    help="render target (default /tmp/watch.ppm, like the "
                         "reference's /tmp/test.ppm)")
    ap.add_argument("--interval", type=float, default=0.5,
                    help="poll interval seconds")
    ap.add_argument("--once", action="store_true",
                    help="render once and exit (for testing the loop body)")
    ap.add_argument("render_args", nargs="*",
                    help="extra args forwarded to python -m rtow_tpu "
                         "(default: a quick 400px/16spp cover render)")
    args = ap.parse_args()

    render_args = args.render_args or ["-w", "400", "-s", "16"]
    cmd = [sys.executable, "-m", "rtow_tpu", *render_args, "-o", args.output]

    def render() -> None:
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[watch] render {status} in {time.time() - t0:.1f}s "
              f"-> {args.output}", file=sys.stderr)

    print(f"[watch] watching {', '.join(WATCH_DIRS)}; cmd: {' '.join(cmd)}",
          file=sys.stderr)
    render()
    if args.once:
        return 0
    last = snapshot()
    while True:
        time.sleep(args.interval)
        now = snapshot()
        if now != last:
            last = now
            render()


if __name__ == "__main__":
    sys.exit(main())
