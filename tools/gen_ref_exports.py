"""Snapshot every public name a reference (shenweichen/DeepCTR) user can import.

Run with the reference environment:

    TF_USE_LEGACY_KERAS=1 PYTHONPATH=/root/reference python tools/gen_ref_exports.py

Writes tests/ref_exports.json: module -> sorted list of public names.
A "public name" is what `from <module> import *` would see: the module's
__all__ if defined, else every non-underscore attribute DEFINED OR
RE-EXPORTED there (we keep imported names too — reference users import
`from deepctr.layers import ...` names that live in submodules).

The companion test (tests/export_parity_test.py) asserts each snapshot
name resolves in our corresponding deepctr_tpu module, with a documented
exception list for TF-runtime internals we intentionally do not mirror.
"""
import importlib
import json
import os
import types

MODULES = [
    "deepctr",
    "deepctr.feature_column",
    "deepctr.inputs",
    "deepctr.utils",
    "deepctr.layers",
    "deepctr.layers.core",
    "deepctr.layers.interaction",
    "deepctr.layers.sequence",
    "deepctr.layers.normalization",
    "deepctr.layers.activation",
    "deepctr.layers.utils",
    "deepctr.models",
    "deepctr.models.sequence",
    "deepctr.models.multitask",
]

# tf.estimator is gone from TF 2.21, so the reference estimator tier cannot
# be imported here; snapshot its public surface by AST instead (same
# approach as tools/gen_ref_signatures.py).
AST_MODULES = {
    "deepctr.estimator": "/root/reference/deepctr/estimator/__init__.py",
    "deepctr.estimator.models":
        "/root/reference/deepctr/estimator/models/__init__.py",
    "deepctr.estimator.inputs":
        "/root/reference/deepctr/estimator/inputs.py",
    "deepctr.estimator.feature_column":
        "/root/reference/deepctr/estimator/feature_column.py",
}

# The contrib modules import TF1 runtime internals (RNNCell, variable_scope,
# TensorArray machinery) wholesale; the product API is exactly the names
# DEFINED there (QAAttGRUCell/VecAttGRUCell/dynamic_rnn), so snapshot
# def/class names only — imports are TF plumbing, not contrib surface.
AST_DEFS_ONLY = {
    "deepctr.contrib.utils": "/root/reference/deepctr/contrib/utils.py",
    "deepctr.contrib.rnn": "/root/reference/deepctr/contrib/rnn.py",
    "deepctr.contrib.rnn_v2": "/root/reference/deepctr/contrib/rnn_v2.py",
}


def public_names(mod):
    if hasattr(mod, "__all__"):
        return sorted(str(n) for n in mod.__all__)
    names = []
    for n in dir(mod):
        if n.startswith("_"):
            continue
        v = getattr(mod, n)
        # skip plain submodule objects picked up by `import deepctr.layers`
        if isinstance(v, types.ModuleType):
            continue
        names.append(n)
    return sorted(names)


def ast_public_names(path, defs_only=False):
    import ast

    tree = ast.parse(open(path).read())
    names = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            if not node.name.startswith("_"):
                names.add(node.name)
        elif isinstance(node, ast.ImportFrom) and not defs_only:
            for alias in node.names:
                n = alias.asname or alias.name
                if not n.startswith("_") and n != "*":
                    names.add(n)
    return sorted(names)


def main():
    out = {}
    for name in MODULES:
        mod = importlib.import_module(name)
        out[name] = public_names(mod)
    for name, path in AST_MODULES.items():
        out[name] = ast_public_names(path)
    for name, path in AST_DEFS_ONLY.items():
        out[name] = ast_public_names(path, defs_only=True)
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "ref_exports.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    total = sum(len(v) for v in out.values())
    print(f"wrote {path}: {len(out)} modules, {total} names")


if __name__ == "__main__":
    main()
