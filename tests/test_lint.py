"""The from-scratch AST linter (scripts/lint.py): rule unit tests on code
snippets, plus the repo-must-stay-clean gate (the CI lint step runs the same
command; this keeps it enforced for plain `pytest` runs too)."""

import pathlib
import subprocess
import sys
import textwrap

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import lint  # noqa: E402


def findings_for(src: str, name: str = "snippet.py"):
    p = pathlib.Path("/tmp") / name
    p.write_text(textwrap.dedent(src))
    return [(f.rule, f.line) for f in lint.check_file(p)]


def rules_for(src: str):
    return {r for r, _ in findings_for(src)}


def test_unused_import():
    assert rules_for("import os\nimport sys\nprint(sys.path)\n") == {
        "unused-import"}
    assert rules_for("import os\nprint(os.path)\n") == set()
    # attribute use, aliasing, and __all__ export all count as use
    assert rules_for("import os.path\nprint(os.path)\n") == set()
    assert rules_for("from x import y as z\nprint(z)\n") == set()
    assert rules_for("from x import y\n__all__ = ['y']\n") == set()
    # __future__ imports are compiler directives, never "unused"
    assert rules_for("from __future__ import annotations\n") == set()


def test_unused_import_skips_dunder_init():
    assert findings_for("from x import y\n", name="__init__.py") == []


def test_mutable_default_and_bare_except():
    src = """
    def f(x=[]):
        try:
            pass
        except:
            pass
    """
    assert rules_for(src) == {"mutable-default", "bare-except"}
    assert "mutable-default" in rules_for("def g(a, b=dict()):\n    pass\n")
    assert rules_for("def h(a, b=None, c=()):\n    pass\n") == set()


def test_fstring_rules():
    assert rules_for("x = f'no fields here'\n") == {"fstring-no-fields"}
    assert rules_for("y = 1\nx = f'{y}'\n") == set()
    # a format spec nests its own JoinedStr; must not false-positive
    assert rules_for("y = 1.0\nx = f'{y:.0f}'\n") == set()


def test_comparison_rules():
    assert rules_for("def f(x):\n    return x is 3\n") == {"is-literal"}
    assert rules_for("def f(x):\n    return x == True\n") == {"eq-singleton"}
    assert rules_for("def f(x):\n    return x is None\n") == set()
    assert rules_for("def f(x):\n    x == 3\n") == {"useless-compare"}


def test_structure_rules():
    assert rules_for(
        "d = {'a': 1, 'a': 2}\n") == {"duplicate-dict-key"}
    assert rules_for(
        "def f():\n    assert (True, 'oops')\n") == {"assert-tuple"}
    assert rules_for(
        "def f():\n    pass\ndef f():\n    pass\n") == {"redefinition"}
    # decorated redefinition (e.g. @property/@x.setter) is legitimate
    assert rules_for(
        "def f():\n    pass\n@d\ndef f():\n    pass\n") == set()
    assert rules_for("def list():\n    pass\n") == {"shadow-builtin"}
    assert rules_for(
        "class C:\n    def __init__(self):\n        return 3\n") == {
            "return-in-init"}


def test_suppression_comment():
    assert rules_for("import os  # lint: ok\n") == set()


def test_repo_is_lint_clean():
    proc = subprocess.run([sys.executable, str(REPO / "scripts" / "lint.py")],
                          cwd=REPO, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
