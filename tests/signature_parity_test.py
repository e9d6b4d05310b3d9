"""Mechanical API-surface parity vs the reference factory signatures.

tests/ref_signatures.json is an AST snapshot of every reference model
factory (ref deepctr/models/__init__.py, 29) and estimator factory
(ref deepctr/estimator/models/__init__.py, 13), regenerated with
tools/gen_ref_signatures.py. These tests assert that each deepctr_tpu
factory exposes the same parameters, in the same order, with the same
defaults — so any accidental drift from the reference API is caught
without importing TF.
"""
from __future__ import annotations

import inspect
import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "ref_signatures.json")
with open(FIXTURE) as f:
    REF = json.load(f)

# Reference constants that appear (by name) inside default expressions the
# AST snapshot could not literal-eval. Values cited from the reference:
# DEFAULT_GROUP_NAME ref feature_column.py:21.
_SRC_CONSTANTS = {
    "(DEFAULT_GROUP_NAME,)": ("default_group",),
    "[DEFAULT_GROUP_NAME]": ["default_group"],
    "DEFAULT_GROUP_NAME": "default_group",
}

# Documented intentional deviations from the reference surface.
# name -> {param: reason} (param accepted to differ or be extra/missing).
_ALLOWED = {}


def _norm(v):
    if isinstance(v, tuple):
        return [_norm(x) for x in v]
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def _ref_default(d):
    if isinstance(d, dict) and "__src__" in d:
        src = d["__src__"]
        if src in _SRC_CONSTANTS:
            return _norm(_SRC_CONSTANTS[src])
        return d  # unknown expression: compared as never-equal sentinel
    return _norm(d)


def _compare(name, ours, ref_params):
    sig = inspect.signature(ours)
    our_params = [p for p in sig.parameters.values()
                  if p.kind not in (inspect.Parameter.VAR_POSITIONAL,
                                    inspect.Parameter.VAR_KEYWORD)]
    allowed = _ALLOWED.get(name, {})
    ref_names = [p["name"] for p in ref_params]
    our_names = [p.name for p in our_params]

    missing = [n for n in ref_names if n not in our_names and n not in allowed]
    assert not missing, "%s: missing reference params %s" % (name, missing)

    extra = [n for n in our_names if n not in ref_names and n not in allowed]
    assert not extra, "%s: params not in the reference %s" % (name, extra)

    shared_ref = [p for p in ref_params if p["name"] in our_names]
    shared_ours = [p for p in our_params if p.name in ref_names]
    assert [p["name"] for p in shared_ref] == [p.name for p in shared_ours], (
        "%s: parameter order differs: ref %s vs ours %s"
        % (name, ref_names, our_names))

    for rp, op in zip(shared_ref, shared_ours):
        if rp["name"] in allowed:
            continue
        if rp["required"]:
            assert op.default is inspect.Parameter.empty, (
                "%s.%s: required in reference, has default %r here"
                % (name, rp["name"], op.default))
            continue
        assert op.default is not inspect.Parameter.empty, (
            "%s.%s: optional in reference (default %r), required here"
            % (name, rp["name"], rp["default"]))
        want = _ref_default(rp["default"])
        if isinstance(want, dict) and "__src__" in want:
            continue  # non-literal reference default; name/order checked above
        got = _norm(op.default)
        assert got == want, (
            "%s.%s: default differs: ref %r vs ours %r"
            % (name, rp["name"], want, got))


@pytest.mark.parametrize("name", sorted(REF["models"]))
def test_model_signature_matches_reference(name):
    import deepctr_tpu.models as m

    _compare(name, getattr(m, name), REF["models"][name])


@pytest.mark.parametrize("name", sorted(REF["estimators"]))
def test_estimator_signature_matches_reference(name):
    import deepctr_tpu.estimator as em

    _compare(name, getattr(em, name), REF["estimators"][name])
