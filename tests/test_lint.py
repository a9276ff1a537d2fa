"""The lint policy must be enforced, not just written — the reference
builds with clang-tidy `WarningsAsErrors: '*'` (reference .clang-tidy:2);
our equivalent gate is tools/lint.py, run here so `pytest` fails on any
violation."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "lint.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, f"lint problems:\n{proc.stdout}"
