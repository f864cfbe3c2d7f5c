"""The scale lint must stay clean: every driver-collect / global-window /
cross-join in the engine carries a reviewed '# scale-ok: <why>' marker."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scale_lint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_lint.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
