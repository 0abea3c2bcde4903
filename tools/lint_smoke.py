"""Stdlib lint smoke — the sandbox has no ruff, so this implements the
highest-signal slice of the CI lint step (pyflakes' F401 unused-import
and E999 syntax-error classes) with ast only, over the same targets the
workflow's `ruff check` names. CI runs the real ruff (pyproject
[tool.ruff]); this keeps the repo lint-clean where ruff can't run.

Usage: python tools/lint_smoke.py   (exit 1 on findings)
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGETS = ("etl_wlg_metlink_spark", "tests", "tools", "bench.py",
           "__spark_entry__.py")


def _py_files() -> list[str]:
    out = []
    for t in TARGETS:
        p = os.path.join(REPO, t)
        if os.path.isfile(p):
            out.append(p)
        else:
            for root, _dirs, files in os.walk(p):
                out += [os.path.join(root, f) for f in files if f.endswith(".py")]
    return sorted(out)


def _imported_names(node: ast.AST):
    if isinstance(node, ast.Import):
        for a in node.names:
            yield a.asname or a.name.split(".")[0], node.lineno
    elif isinstance(node, ast.ImportFrom):
        # future statements are directives, not bindings (ruff exempts
        # them from F401 the same way)
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name != "*":
                yield a.asname or a.name, node.lineno


def check_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    noqa_lines = {
        i + 1 for i, line in enumerate(src.splitlines()) if "# noqa" in line
    }
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        for name, lineno in _imported_names(node):
            if lineno not in noqa_lines and name != "__future__":
                imported.setdefault(name, lineno)
    used = {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name)
    } | {
        n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)
    }
    # attribute roots: `pa.Table` marks `pa` used
    used |= {
        node.value.id
        for node in ast.walk(tree)
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name)
    }
    # names referenced in __all__ or docstring-level re-exports count
    return [
        f"{path}:{lineno}: unused import '{name}' (F401)"
        for name, lineno in sorted(imported.items(), key=lambda kv: kv[1])
        if name not in used and f'"{name}"' not in src and f"'{name}'" not in src
    ]


def main() -> int:
    findings: list[str] = []
    files = _py_files()
    for path in files:
        findings += check_file(path)
    for f in findings:
        print(os.path.relpath(f, REPO) if f.startswith("/") else f)
    print(f"{len(files)} files checked, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
