"""Generate per-model documentation pages from the factory docstrings
(reference docs/source has one page per model; here they are derived from
the source of truth — run after changing factory signatures)."""
import inspect
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import deepctr_tpu.models as M
    from deepctr_tpu.estimator import models as EM

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models")
    os.makedirs(here, exist_ok=True)
    names = list(M.__all__) if hasattr(M, "__all__") else sorted(
        n for n in dir(M) if n[0].isupper())
    index = ["# Per-model reference", "",
             "Generated from factory docstrings by `docs/gen_model_docs.py`.",
             ""]
    for name in sorted(set(names)):
        fn = getattr(M, name)
        if not callable(fn):
            continue
        sig = str(inspect.signature(fn))
        doc = inspect.getdoc(fn) or ""
        est = name + "Estimator"
        est_note = ""
        if hasattr(EM, est):
            esig = str(inspect.signature(getattr(EM, est)))
            est_note = ("\n\n## Estimator variant\n\n```python\n%s%s\n```\n"
                        % (est, esig))
        page = ("# %s\n\n```python\n%s%s\n```\n\n%s%s" %
                (name, name, sig, doc, est_note))
        with open(os.path.join(here, name + ".md"), "w") as f:
            f.write(page)
        index.append("- [%s](%s.md)" % (name, name))
    with open(os.path.join(here, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print("wrote %d model pages" % (len(index) - 4))


if __name__ == "__main__":
    main()
