"""Minimal in-image lint: syntax + name checks over the repo.

ruff/mypy are not baked into this build image (pip installs are
disallowed, the image has no network egress); CI runs the real tools
(.github/workflows/tests.yaml).  This script executes the
highest-signal checks locally:

1. every source file parses (``ast.parse`` == ruff's E9 class)
2. no unused imports (ruff F401), with the usual escapes: ``__init__``
   re-exports, ``__all__`` entries, ``# noqa`` lines, and intentional
   side-effect imports marked ``# lint: side-effect``.
3. no undefined names (ruff F821, conservative form): a loaded name
   must be bound SOMEWHERE in its scope chain (current function,
   any enclosing function, class body, module, builtins).  Ignoring
   binding order trades use-before-def detection for a zero
   false-positive rate — what this catches is true typos.
4. every ``__all__`` entry is actually defined in the module (F822).

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
        # re-export surface: unused-import check not meaningful, but
        # undefined names / __all__ integrity still are
        return check_names(path, tree)
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
    problems.extend(check_names(path, tree))
    return problems


#: extra names the runtime provides beyond ``builtins``
_IMPLICIT = {
    "__file__", "__name__", "__doc__", "__builtins__", "__spec__",
    "__package__", "__debug__", "__class__", "__path__", "__loader__",
    "__annotations__", "__dict__", "__module__", "__qualname__",
}

_SCOPE_NODES = (
    ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda,
    ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp,
)


def _bindings(scope: ast.AST) -> set[str]:
    """Names bound anywhere directly in ``scope`` (not nested scopes)."""
    bound: set[str] = set()

    def add_target(t):
        if isinstance(t, ast.Name):
            bound.add(t.id)
        elif isinstance(t, (ast.Tuple, ast.List)):
            for e in t.elts:
                add_target(e)
        elif isinstance(t, ast.Starred):
            add_target(t.value)

    if isinstance(scope, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.Lambda)):
        a = scope.args
        for arg in (a.posonlyargs + a.args + a.kwonlyargs
                    + ([a.vararg] if a.vararg else [])
                    + ([a.kwarg] if a.kwarg else [])):
            bound.add(arg.arg)
    if isinstance(scope, (ast.ListComp, ast.SetComp, ast.DictComp,
                          ast.GeneratorExp)):
        for comp in scope.generators:
            add_target(comp.target)

    stack = list(ast.iter_child_nodes(scope))
    while stack:
        node = stack.pop()
        if isinstance(node, _SCOPE_NODES) or isinstance(node, ast.ClassDef):
            # a nested scope binds its own name (def/class) here, but
            # its internals are not this scope's bindings — EXCEPT
            # walruses inside comprehensions, which bind in the parent.
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                bound.add(node.name)
            if isinstance(node, (ast.ListComp, ast.SetComp, ast.DictComp,
                                 ast.GeneratorExp)):
                for sub in ast.walk(node):
                    if isinstance(sub, ast.NamedExpr):
                        add_target(sub.target)
            continue
        if isinstance(node, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
            tgts = node.targets if isinstance(node, ast.Assign) \
                else [node.target]
            for t in tgts:
                add_target(t)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            add_target(node.target)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                if alias.name != "*":
                    bound.add(alias.asname or alias.name.split(".")[0])
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, (ast.With, ast.AsyncWith)):
            for item in node.items:
                if item.optional_vars is not None:
                    add_target(item.optional_vars)
        elif isinstance(node, ast.NamedExpr):
            add_target(node.target)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
        elif isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
        stack.extend(ast.iter_child_nodes(node))
    return bound


def _has_star_import(tree: ast.Module) -> bool:
    return any(
        isinstance(n, ast.ImportFrom)
        and any(a.name == "*" for a in n.names)
        for n in ast.walk(tree)
    )


def check_names(path: pathlib.Path, tree: ast.Module) -> list[str]:
    """F821-conservative + F822 over one parsed module."""
    import builtins

    if _has_star_import(tree):
        return []  # cannot resolve the imported surface statically
    problems: list[str] = []
    base = set(dir(builtins)) | _IMPLICIT
    # a `global X` inside any function binds X at module level
    base |= {
        n for node in ast.walk(tree)
        if isinstance(node, ast.Global) for n in node.names
    }
    src_lines = path.read_text().splitlines()

    def visit(scope, chain):
        here = chain | _bindings(scope)
        for node in ast.iter_child_nodes(scope):
            walk_expr(node, here)

    def walk_expr(node, visible):
        if isinstance(node, _SCOPE_NODES) or isinstance(node, ast.ClassDef):
            # defaults/decorators/bases evaluate in the CURRENT scope
            for sub in getattr(node, "decorator_list", []):
                walk_expr(sub, visible)
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for d in node.args.defaults + [
                    d for d in node.args.kw_defaults if d is not None
                ]:
                    walk_expr(d, visible)
            if isinstance(node, ast.ClassDef):
                for b in node.bases + [kw.value for kw in node.keywords]:
                    walk_expr(b, visible)
            visit(node, visible)
            return
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id not in visible and node.id not in base:
                line = src_lines[node.lineno - 1] \
                    if node.lineno <= len(src_lines) else ""
                if "noqa" not in line:
                    problems.append(
                        f"{path}:{node.lineno}: undefined name "
                        f"{node.id!r}"
                    )
            return
        for child in ast.iter_child_nodes(node):
            walk_expr(child, visible)

    visit(tree, base)

    module_names = _bindings(tree)
    for name in sorted(_all_exports(tree)):
        if name not in module_names:
            problems.append(
                f"{path}:1: __all__ entry {name!r} is not defined "
                f"in the module"
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
