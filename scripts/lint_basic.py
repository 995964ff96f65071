"""Minimal in-image lint: syntax + unused-import check over the repo.

ruff/mypy are not baked into this build image (pip installs are
disallowed); CI runs the real tools (.github/workflows/tests.yaml).
This script gives the same two highest-signal checks locally:

1. every source file parses (``ast.parse`` == ruff's E9 class)
2. no unused imports (ruff F401), with the usual escapes: ``__init__``
   re-exports, ``__all__`` entries, ``# noqa`` lines, and intentional
   side-effect imports marked ``# lint: side-effect``.

Exit code 0 = clean.  Used by tests/test_docs.py so the fast suite
keeps the tree lint-clean between CI runs.
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).parent.parent
TARGETS = ("pywindow_tpu", "tests", "scripts", "examples")


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # attribute roots count: `np.foo` uses `np`
            inner = node.value
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    return used


def _all_exports(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        names.update(
                            elt.value
                            for elt in node.value.elts
                            if isinstance(elt, ast.Constant)
                        )
    return names


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]
    if path.name == "__init__.py":
        return []  # re-export surface: unused-import check not meaningful
    used = _used_names(tree)
    used |= _all_exports(tree)
    lines = src.splitlines()
    problems: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
        if "noqa" in line or "side-effect" in line:
            continue
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue
        for alias in node.names:
            if alias.name == "*":
                continue
            bound = alias.asname or alias.name.split(".")[0]
            if bound not in used:
                problems.append(
                    f"{path}:{node.lineno}: unused import {bound!r}"
                )
    return problems


def main() -> int:
    problems: list[str] = []
    for target in TARGETS:
        base = ROOT / target
        if not base.exists():
            continue
        for path in sorted(base.rglob("*.py")):
            if ".ipynb_checkpoints" in path.parts:
                continue
            problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(f"lint_basic: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
