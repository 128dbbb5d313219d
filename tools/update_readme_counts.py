#!/usr/bin/env python3
"""Derive README's test count from a real `sbt test` run instead of
hand-syncing it (r10 verdict task 7: README said 394 while the suite ran
403).

Usage: sbt -batch test 2>&1 | tee /tmp/test.log; tools/update_readme_counts.py /tmp/test.log

Parses ScalaTest's `Total number of tests run: N` and `Suites: completed
M` from the log, refuses to touch README on a failed run, and rewrites
the single `sbt test runs ...` sentence in README.md.
"""
import re
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/test.log"
README = "README.md"

log = open(LOG).read()
m_n = re.search(r"Total number of tests run: (\d+)", log)
m_s = re.search(r"Suites: completed (\d+), aborted (\d+)", log)
ok = "All tests passed." in log
if not (m_n and m_s and ok and m_s.group(2) == "0"):
    sys.exit(f"refusing to update README: tests={bool(m_n)} suites={bool(m_s)} "
             f"passed={ok} — run `sbt test` to green first")
n, suites = m_n.group(1), m_s.group(1)

src = open(README).read()
new, count = re.subn(
    r"`sbt test` runs \d+ unit/property/golden/plan-shape/",
    f"`sbt test` runs {n} unit/property/golden/plan-shape/",
    src)
if count != 1:
    sys.exit(f"expected exactly one README test-count sentence, found {count}")
open(README, "w").write(new)
print(f"README.md: test count -> {n} ({suites} suites)")
