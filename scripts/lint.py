#!/usr/bin/env python
"""From-scratch AST linter — the repo's ``go vet`` equivalent.

The reference gates CI on ``go fmt`` + ``go vet``
(/root/reference/.github/workflows/test.yml:36-39). This environment ships
no Python linter (and installs are pinned), so — in the same spirit as the
reference's dependency-free engine — this is a real static checker built on
stdlib ``ast``, not a syntax check. Rules (all measured to be
zero-false-positive on this codebase; suppress a line with ``# lint: ok``):

  unused-import        imported name never referenced in the module
  mutable-default      def f(x=[]) / f(x={}) / f(x=set()) — shared state bug
  bare-except          ``except:`` swallows KeyboardInterrupt/SystemExit
  fstring-no-fields    f-string without any {placeholder}
  is-literal           ``x is 3`` / ``x is "s"`` — identity on literals
  eq-singleton         ``== True`` / ``== False`` / ``== None``
  duplicate-dict-key   literal dict with a repeated constant key
  assert-tuple         ``assert (cond, "msg")`` is always truthy
  redefinition         def/class name rebound in the same scope
  shadow-builtin       def/class statement named after a builtin
  return-in-init       ``return value`` inside __init__
  useless-compare      expression-statement comparison (result discarded)

Exit status 1 when any finding is emitted; prints file:line: rule: detail.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

SUPPRESS = "# lint: ok"


class Finding:
    def __init__(self, path: Path, line: int, rule: str, detail: str):
        self.path, self.line, self.rule, self.detail = path, line, rule, detail

    def __str__(self) -> str:
        return f"{self.path}:{self.line}: {self.rule}: {self.detail}"


def iter_scopes(tree: ast.AST):
    """Yield (scope_node, direct statements) for module/class/function."""
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            yield node


def check_file(path: Path) -> list[Finding]:
    src = path.read_text()
    lines = src.splitlines()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [Finding(path, exc.lineno or 0, "syntax-error", str(exc.msg))]
    out: list[Finding] = []

    def add(node: ast.AST, rule: str, detail: str) -> None:
        line = getattr(node, "lineno", 0)
        if 0 < line <= len(lines) and SUPPRESS in lines[line - 1]:
            return
        out.append(Finding(path, line, rule, detail))

    # ---- unused imports (module level; skip __init__ re-export surfaces)
    if path.name != "__init__.py":
        imported: dict[str, ast.AST] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    name = (a.asname or a.name).split(".")[0]
                    imported.setdefault(name, node)
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue   # compiler directive, not a binding to "use"
                for a in node.names:
                    if a.name == "*":
                        continue
                    imported.setdefault(a.asname or a.name, node)
        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                base = node
                while isinstance(base, ast.Attribute):
                    base = base.value
                if isinstance(base, ast.Name):
                    used.add(base.id)
        # names exported via __all__ strings count as used
        for node in ast.walk(tree):
            if (isinstance(node, ast.Assign)
                    and any(isinstance(t, ast.Name) and t.id == "__all__"
                            for t in node.targets)
                    and isinstance(node.value, (ast.List, ast.Tuple))):
                for elt in node.value.elts:
                    if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                        used.add(elt.value)
        for name, node in imported.items():
            if name not in used:
                add(node, "unused-import", name)

    shadowable = set(dir(builtins)) - {"_", "__doc__", "__name__"}

    for scope in iter_scopes(tree):
        body = scope.body
        seen_defs: dict[str, int] = {}
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                prev = seen_defs.get(stmt.name)
                deco = bool(getattr(stmt, "decorator_list", []))
                if prev is not None and not deco:
                    add(stmt, "redefinition",
                        f"{stmt.name} (first defined line {prev})")
                seen_defs[stmt.name] = stmt.lineno
                if stmt.name in shadowable:
                    add(stmt, "shadow-builtin", stmt.name)

    # format specs are themselves JoinedStr nodes (f"{x:.0f}" nests one
    # holding only ".0f") — they must not trip fstring-no-fields
    format_specs = {
        id(node.format_spec) for node in ast.walk(tree)
        if isinstance(node, ast.FormattedValue) and node.format_spec is not None
    }

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in (node.args.defaults + node.args.kw_defaults):
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    add(default, "mutable-default",
                        f"in def {node.name}(...)")
                elif (isinstance(default, ast.Call)
                      and isinstance(default.func, ast.Name)
                      and default.func.id in ("list", "dict", "set")):
                    add(default, "mutable-default",
                        f"{default.func.id}() in def {node.name}(...)")
            if node.name == "__init__":
                for sub in ast.walk(node):
                    if (isinstance(sub, ast.Return) and sub.value is not None
                            and not (isinstance(sub.value, ast.Constant)
                                     and sub.value.value is None)):
                        add(sub, "return-in-init", "returns a value")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            add(node, "bare-except", "use 'except Exception:' at least")
        elif isinstance(node, ast.JoinedStr) and id(node) not in format_specs:
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                add(node, "fstring-no-fields", "f-string has no placeholders")
        elif isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Is, ast.IsNot)) and (
                        isinstance(comp, ast.Constant)
                        and isinstance(comp.value, (int, float, str))
                        and not isinstance(comp.value, bool)):
                    add(node, "is-literal", repr(comp.value))
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                        isinstance(comp, ast.Constant)
                        and (comp.value is None or comp.value is True
                             or comp.value is False)):
                    add(node, "eq-singleton",
                        f"use 'is {comp.value}' instead of '== {comp.value}'")
        elif isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys
                    if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            if dupes:
                add(node, "duplicate-dict-key", repr(sorted(dupes, key=str)))
        elif isinstance(node, ast.Assert) and isinstance(node.test, ast.Tuple):
            add(node, "assert-tuple", "always true; drop the parentheses")
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Compare):
            add(node, "useless-compare", "comparison result is discarded")
    return out


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in argv] or [
        Path("llama_nuts_and_bolts_tpu"), Path("tests"), Path("scripts"),
        Path("examples"), Path("bench.py"), Path("__graft_entry__.py")]
    findings: list[Finding] = []
    n_files = 0
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            if "__pycache__" in f.parts:
                continue
            n_files += 1
            findings.extend(check_file(f))
    for f in findings:
        print(f)
    print(f"lint: {n_files} files, {len(findings)} finding(s)",
          file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
