"""Packaging guards (VERDICT r3 #5: `flax` was imported by models/vit.py
but missing from [project] dependencies, so a clean pip install could not
import the package).

Two gates:
  1. every module-level (unconditional) third-party import anywhere in
     `starst3r_tpu/` must be covered by [project] dependencies;
  2. lazy/optional imports (scipy, torch) must NOT appear at module level.
"""

import ast
import os
import sys

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "starst3r_tpu")
PYPROJECT = os.path.join(os.path.dirname(PKG), "pyproject.toml")

# import-name -> pip distribution for declared deps
DECLARED = {
    "flax": "flax",
    "jax": "jax",
    "numpy": "numpy",
    "optax": "optax",
    "PIL": "pillow",
}
OPTIONAL = {"scipy", "torch"}   # must stay function-level (lazy)
STDLIB = set(sys.stdlib_module_names) | {"__future__"}


def _module_level_imports(path):
    """Top-level import names at MODULE scope only (function-level imports
    are lazy and excluded)."""
    with open(path) as f:
        tree = ast.parse(f.read(), path)
    names = set()
    for node in tree.body:                      # module scope only
        if isinstance(node, ast.Import):
            names.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            if node.module:
                names.add(node.module.split(".")[0])
    return names


def _all_imports(path):
    with open(path) as f:
        tree = ast.parse(f.read(), path)
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            names.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            if node.module:
                names.add(node.module.split(".")[0])
    return names


def _pkg_files():
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                yield os.path.join(root, fn)


def _declared_deps():
    import re
    with open(PYPROJECT) as f:
        text = f.read()
    m = re.search(r"^dependencies\s*=\s*\[(.*?)\]", text,
                  re.DOTALL | re.MULTILINE)
    assert m, "no [project] dependencies block found"
    return set(re.findall(r'"([A-Za-z0-9_.-]+)', m.group(1)))


def test_module_level_imports_are_declared():
    deps = _declared_deps()
    missing = {}
    for path in _pkg_files():
        for name in _module_level_imports(path):
            if name in STDLIB or name == "starst3r_tpu":
                continue
            dist = DECLARED.get(name)
            if dist is None or dist not in deps:
                missing.setdefault(name, []).append(
                    os.path.relpath(path, PKG))
    assert not missing, (
        f"module-level imports not covered by pyproject dependencies: "
        f"{missing}")


def test_optional_deps_stay_lazy():
    eager = {}
    for path in _pkg_files():
        hits = _module_level_imports(path) & OPTIONAL
        if hits:
            eager[os.path.relpath(path, PKG)] = sorted(hits)
    assert not eager, f"optional deps imported at module level: {eager}"


def test_all_imports_known():
    """Every import anywhere must be stdlib, declared, optional, or local —
    catches new undeclared deps sneaking in at function level too."""
    known = (STDLIB | set(DECLARED) | OPTIONAL
             | {"starst3r_tpu", "bench"})   # bench: CLI shells to repo root
    unknown = {}
    for path in _pkg_files():
        extra = _all_imports(path) - known
        if extra:
            unknown[os.path.relpath(path, PKG)] = sorted(extra)
    assert not unknown, f"imports from undeclared modules: {unknown}"


def test_wheel_metadata_requires_flax():
    """flax is a hard runtime dep (models/vit.py imports it at module
    level); regression for VERDICT r3 weak #4."""
    assert "flax" in _declared_deps()
