"""Import-layering rules over the package's own module graph — the
reference's architecture-test layer (tests/test_architecture.py,
SURVEY §5): the dependency DIRECTION is the architecture, so freezing it
makes an upward import (an operator reaching into the engine runner, a
pure-function module growing a plans dependency) an explicit test
failure instead of silent coupling.

Layers, bottom to top (lower may never import higher):

    schema / synth  →  functions  →  operators  →  plans  →  streaming
                         sources  ──────────────↗

`cli` and `entry_queries` are top-level surfaces: anything may be
imported BY them, nothing inside the package may import THEM.
"""

from __future__ import annotations

import ast
import os

import codeclone_spark

PKG_ROOT = os.path.dirname(codeclone_spark.__file__)

# package -> internal sub-packages/modules it may import
ALLOWED = {
    "functions": {"functions", "schema", "synth"},
    "operators": {"operators", "functions", "schema"},
    "sources": {"sources", "schema"},
    "plans": {
        "plans", "operators", "sources", "functions", "schema", "synth", "",
    },
    "streaming": {
        "streaming", "plans", "operators", "functions", "schema",
    },
}
SURFACES = {"cli", "entry_queries"}  # importable by tests/users only


def _imports_of(path: str) -> set[str]:
    with open(path) as f:
        tree = ast.parse(f.read())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            mod = node.module
        elif isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith("codeclone_spark"):
                    out.add(a.name)
            continue
        else:
            continue
        if mod.startswith("codeclone_spark"):
            out.add(mod)
    return out


def _first_component(mod: str) -> str:
    rest = mod.split("codeclone_spark", 1)[1].lstrip(".")
    return rest.split(".", 1)[0] if rest else ""


def test_layering():
    violations = []
    for pkg, allowed in ALLOWED.items():
        pdir = os.path.join(PKG_ROOT, pkg)
        for fn in sorted(os.listdir(pdir)):
            if not fn.endswith(".py"):
                continue
            for mod in _imports_of(os.path.join(pdir, fn)):
                comp = _first_component(mod)
                if comp not in allowed:
                    violations.append(f"{pkg}/{fn} imports {mod}")
    assert not violations, "\n".join(violations)


def test_surfaces_not_imported_internally():
    violations = []
    for root, _dirs, files in os.walk(PKG_ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), PKG_ROOT)
            if rel.replace(".py", "") in SURFACES:
                continue
            for mod in _imports_of(os.path.join(root, fn)):
                if _first_component(mod) in SURFACES:
                    violations.append(f"{rel} imports {mod}")
    assert not violations, "\n".join(violations)
