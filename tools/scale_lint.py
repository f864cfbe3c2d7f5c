"""Scale lint: mechanical guard against 100 TB anti-patterns.

Greps the engine package for constructs that are correct on test data but
break at cluster scale, the exact classes the round-1 review flagged by
hand (driver-side corpus collects, global windows, cartesian joins):

- ``.collect()`` / ``.toPandas()`` — driver materialization. Legitimate
  only for scalars / bounded metadata (per-partition counts, k centroids,
  sketch boundaries, bounded corpus chunks).
- ``Window.orderBy(...)`` without a ``partitionBy`` (incl. empty
  ``partitionBy()``) — funnels the frame through ONE task.
- ``.crossJoin(`` — cartesian unless the broadcast side is bounded.
- ``unboundedFollowing`` frames whose start is not unboundedPreceding —
  Spark evaluates those by re-scanning the rest of the partition for
  EVERY row, O(rows × partition size) (the round-6 gapfill finding:
  12 s → 119 s across one decade). The FULL-partition frame
  (unboundedPreceding → unboundedFollowing) is computed once per
  partition and passes; "next value" lookups must be written as
  running ``last(ignorenulls)`` over the reversed total order.

A legitimate site must carry a ``# scale-ok: <why>`` marker on the same
line or the line above; the reason is the reviewable artifact. crossJoin
of a ``F.broadcast(...)`` argument on the same line passes without a
marker (the bounded-side idiom).

Usage: python tools/scale_lint.py   (exit 1 + report on violations)
Wired into pytest via tests/test_scale_lint.py.
"""

from __future__ import annotations

import os
import re
import sys

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalakes_and_data_integration_spark",
)
SCAN_DIRS = ["plans", "operators", "streaming", "functions", "pipeline", "sources"]

_COLLECT = re.compile(r"\.collect\(\)|\.toPandas\(\)")
_CROSS = re.compile(r"\.crossJoin\(")
_GLOBAL_WINDOW = re.compile(r"Window\s*\.\s*orderBy\(")
_TAIL_FRAME = re.compile(r"unboundedFollowing", re.IGNORECASE)
_FULL_FRAME = re.compile(r"unboundedPreceding", re.IGNORECASE)
_BETWEEN = re.compile(r"\.(?:rows|range)Between\s*\(")
_MARKER = "scale-ok"


def _frame_spans(text: str):
    """(char offset, argument span) of every rows/rangeBetween(...) call,
    matched to the balanced closing paren — the frame's two bounds are
    routinely split across lines by formatting, so a single-line check
    both false-positives (full-partition frame wrapped) and
    false-negatives (tail frame wrapped past a line that happens to
    contain 'unboundedPreceding')."""
    for m in _BETWEEN.finditer(text):
        start = text.index("(", m.start())
        depth = 0
        for j in range(start, min(len(text), start + 2000)):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    yield m.start(), text[start : j + 1]
                    break


def lint_file(path: str) -> list[tuple[int, str, str]]:
    with open(path, encoding="utf-8") as f:
        lines = f.readlines()
    out = []
    for i, line in enumerate(lines):
        stripped = line.strip()
        if stripped.startswith("#"):
            continue
        ok = _MARKER in line or (i > 0 and _MARKER in lines[i - 1])
        if _COLLECT.search(line) and not ok:
            out.append((i + 1, "driver-collect", stripped))
        if _CROSS.search(line) and not ok and "broadcast" not in line:
            out.append((i + 1, "cross-join", stripped))
        if _GLOBAL_WINDOW.search(line) and not ok:
            # Window.orderBy(...) chained after partitionBy is fine; the
            # pattern only matches orderBy called directly on the class.
            out.append((i + 1, "global-window", stripped))
    # Tail-rescan frames are matched on the whole rows/rangeBetween(...)
    # argument span (frames wrap across lines): (x, unboundedFollowing)
    # with x != unboundedPreceding re-scans the partition tail per row;
    # the full-partition frame passes (computed once per partition).
    text = "".join(lines)
    for pos, span in _frame_spans(text):
        lineno = text.count("\n", 0, pos) + 1
        first = lines[lineno - 1]
        if first.strip().startswith("#"):
            continue
        ok = _MARKER in first or (
            lineno >= 2 and _MARKER in lines[lineno - 2]
        )
        if _TAIL_FRAME.search(span) and not _FULL_FRAME.search(span) and not ok:
            out.append((lineno, "tail-rescan-frame", first.strip()))
    return out


def main() -> int:
    violations = []
    for d in SCAN_DIRS:
        root = os.path.join(PKG, d)
        if not os.path.isdir(root):
            continue
        for dirpath, _, files in os.walk(root):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                for lineno, kind, text in lint_file(path):
                    rel = os.path.relpath(path, os.path.dirname(PKG))
                    violations.append(f"{rel}:{lineno} [{kind}] {text}")
    if violations:
        print("scale-lint violations (annotate with '# scale-ok: <why>' if bounded):")
        for v in violations:
            print(" ", v)
        return 1
    print("scale-lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
