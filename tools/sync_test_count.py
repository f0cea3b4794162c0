"""Mechanize the README test count (VERDICT r8 #3 — the same
count-drift class the registry count had before r4's fingerprint
mechanization, now three rounds running as a manual-edit defect).

Runs ``pytest --collect-only -q``, parses the collected-test total,
and rewrites the ``tests/   N tests:`` line in README.md in place.
Round-close ritual: run this, then quote its printed count in
SURVEY.md's current-status line.

Usage: python tools/sync_test_count.py [--check]
       --check exits 1 on drift without rewriting (CI/pre-commit use).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
LINE_RE = re.compile(r"^(tests/\s+)(\d+)( tests:)", re.M)


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    ).stdout
    m = re.search(r"(\d+) tests? collected", out)
    if not m:
        # pytest>=8 prints "N tests collected in Xs" or "no tests ran";
        # fall back to the summary "collected N items" header form.
        m = re.search(r"collected (\d+) items?", out)
    if not m:
        raise SystemExit(f"could not parse collection count from:\n{out[-2000:]}")
    return int(m.group(1))


def main() -> int:
    n = collected_count()
    text = open(README).read()
    m = LINE_RE.search(text)
    if not m:
        raise SystemExit("README.md has no 'tests/  N tests:' line to sync")
    current = int(m.group(2))
    if current == n:
        print(f"README test count already current: {n}")
        return 0
    if "--check" in sys.argv:
        print(f"DRIFT: README says {current}, collection says {n}")
        return 1
    open(README, "w").write(LINE_RE.sub(rf"\g<1>{n}\g<3>", text))
    print(f"README test count: {current} -> {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
