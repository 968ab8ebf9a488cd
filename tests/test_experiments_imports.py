"""Pin every `pl_convlstm_gan_tpu` import in experiments/*.py to something
that actually resolves — including imports nested inside functions, which
don't fail until the experiment runs on TPU hours later.

Motivated by a real failure: the round-4 on-TPU queue's step 8 died on
`from pl_convlstm_gan_tpu.models import build_model` inside
experiments/artifact_latency.py (the symbol had moved to .predict in a
refactor), wasting the queue slot. This walks each script's AST, collects
package imports at any nesting depth, and resolves them for real.
"""
import ast
import importlib
import os

import pytest

PKG = "pl_convlstm_gan_tpu"
EXP_DIR = os.path.join(os.path.dirname(__file__), "..", "experiments")
SCRIPTS = sorted(f for f in os.listdir(EXP_DIR) if f.endswith(".py"))


def _package_imports(path):
    """Yield (module, name_or_None) for every PKG import in the file."""
    tree = ast.parse(open(path).read(), filename=path)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.split(".")[0] == PKG:
            for alias in node.names:
                yield node.module, alias.name
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] == PKG:
                    yield alias.name, None


@pytest.mark.parametrize("script", SCRIPTS)
def test_experiment_package_imports_resolve(script):
    found = list(_package_imports(os.path.join(EXP_DIR, script)))
    for module, name in found:
        mod = importlib.import_module(module)
        if name is not None and name != "*":
            assert hasattr(mod, name), (
                f"{script}: `from {module} import {name}` does not resolve "
                f"— stale import after a refactor?")
