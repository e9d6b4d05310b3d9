"""Snapshot reference DeepCTR factory signatures into tests/ref_signatures.json.

Parses the reference sources with `ast` (no TF import — the estimator tier
cannot even be imported under the TF in this image):

    python tools/gen_ref_signatures.py

The fixture records, for every Keras-model factory exported by
/root/reference/deepctr/models/__init__.py and every Estimator factory in
/root/reference/deepctr/estimator/models/, the ordered parameter names and
their default values (literal-evaluated where possible, else the unparsed
source text). tests/signature_parity_test.py compares deepctr_tpu's
factories against this snapshot so drift from the reference API surface is
caught mechanically.
"""
from __future__ import annotations

import ast
import json
import os
import sys

REF = "/root/reference/deepctr"
HERE = os.path.dirname(os.path.abspath(__file__))


def _default_json(node):
    try:
        return ast.literal_eval(node)
    except Exception:
        return {"__src__": ast.unparse(node)}


def _func_signature(fn: ast.FunctionDef):
    args = fn.args
    params = []
    pos = list(args.posonlyargs) + list(args.args)
    defaults = [None] * (len(pos) - len(args.defaults)) + list(args.defaults)
    for a, d in zip(pos, defaults):
        params.append({
            "name": a.arg,
            "default": None if d is None else _default_json(d),
            "required": d is None,
        })
    for a, d in zip(args.kwonlyargs, args.kw_defaults):
        params.append({
            "name": a.arg,
            "default": None if d is None else _default_json(d),
            "required": d is None,
        })
    return params


def _exported_names(init_path):
    tree = ast.parse(open(init_path).read())
    names = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            names.extend(al.name for al in node.names if al.name != "*")
    return sorted(set(names))


def _collect(pkg_dir, wanted):
    found = {}
    for fname in sorted(os.listdir(pkg_dir)):
        path = os.path.join(pkg_dir, fname)
        if fname.endswith(".py"):
            tree = ast.parse(open(path).read())
            for node in tree.body:
                if isinstance(node, ast.FunctionDef) and node.name in wanted:
                    found[node.name] = _func_signature(node)
        elif os.path.isdir(path) and not fname.startswith("__"):
            found.update(_collect(path, wanted))
    return found


def main():
    models = _collect(os.path.join(REF, "models"),
                      set(_exported_names(os.path.join(REF, "models", "__init__.py"))))
    estimators = _collect(
        os.path.join(REF, "estimator", "models"),
        {n for n in _exported_names(os.path.join(REF, "estimator", "models", "__init__.py"))
         if n.endswith("Estimator")})
    out = {"models": models, "estimators": estimators}
    path = os.path.join(HERE, "..", "tests", "ref_signatures.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote %s: %d models, %d estimators" % (
        path, len(models), len(estimators)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
