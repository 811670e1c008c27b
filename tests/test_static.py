"""Repo-wide static sanity: no module may reference an unresolvable
top-level name. Round 3's official bench artifact was a NameError
traceback from exactly this failure class (an undefined helper shipped
uncalled-in-tests); tests/test_bench.py pins bench.py specifically,
this sweeps every Python file in the repo in ~1 s.

Scope limits (kept deliberately simple): only module-level name
resolution is checked — attribute access, star-imports, and names
injected by decorators/metaclasses are out of scope, and any name
defined ANYWHERE in the file counts as defined (no flow analysis). That
still catches the real-world case: calling a helper that was never
written.
"""

from __future__ import annotations

import ast
import builtins
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _unresolved(path: str) -> list[str]:
    tree = ast.parse(open(path).read())
    defined = set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__package__"}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                defined.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            defined.add(node.name)
        elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign, ast.NamedExpr)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        defined.add(n.id)
        elif isinstance(node, (ast.For, ast.comprehension)):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    defined.add(n.id)
        elif isinstance(node, ast.arg):
            defined.add(node.arg)
        elif isinstance(node, ast.withitem) and node.optional_vars is not None:
            for n in ast.walk(node.optional_vars):
                if isinstance(n, ast.Name):
                    defined.add(n.id)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            defined.add(node.name)
        elif isinstance(node, ast.Global):
            defined.update(node.names)
    loaded = {
        n.id
        for n in ast.walk(tree)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }
    return sorted(loaded - defined)


def test_no_duplicate_dict_literal_keys():
    """A duplicate key in a dict LITERAL silently keeps only the last
    value — r7 found exactly this in queries._FORCE_REGRADE, where an
    old r5 entry overwrote the newer r7 round number and would have
    skipped a pending re-grade. Python doesn't warn; this does."""
    paths = glob.glob(
        os.path.join(REPO, "chronobase_spark/**/*.py"), recursive=True
    ) + [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    bad: dict[str, list[str]] = {}
    for p in paths:
        for node in ast.walk(ast.parse(open(p).read())):
            if not isinstance(node, ast.Dict):
                continue
            seen: set[object] = set()
            for k in node.keys:
                if k is None or not isinstance(k, ast.Constant):
                    continue  # **spread / computed keys: out of scope
                if k.value in seen:
                    bad.setdefault(os.path.relpath(p, REPO), []).append(
                        f"line {k.lineno}: {k.value!r}"
                    )
                seen.add(k.value)
    assert not bad, f"duplicate dict-literal keys: {bad}"


def test_no_unresolved_names_anywhere():
    paths = (
        glob.glob(os.path.join(REPO, "chronobase_spark/**/*.py"), recursive=True)
        + glob.glob(os.path.join(REPO, "scripts/*.py"))
        + glob.glob(os.path.join(REPO, "tests/*.py"))
        + [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    )
    assert len(paths) > 20  # the glob actually found the repo
    bad = {os.path.relpath(p, REPO): m for p in paths if (m := _unresolved(p))}
    assert not bad, f"unresolved names: {bad}"
