"""Misc utilities (reference deepctr/utils.py:21-46).

``check_version`` polls PyPI for a newer release on a daemon thread — the
reference's only "telemetry". Kept for API parity but OFF by default (set
DEEPCTR_TPU_CHECK_VERSION=1 to enable); this environment has no egress and a
library should not phone home silently.
"""
from __future__ import annotations

import json
import logging
import os
from threading import Thread


def enable_compilation_cache(cache_dir=None, min_compile_time_secs=1.0):
    """Turn on JAX's persistent compilation cache (opt-in).

    CTR models compile one XLA program per (model, batch size, K); on
    backends where compilation is remote/slow (this image's TPU tunnel
    swings 1s-6min per program) caching executables on disk makes every
    process after the first start instantly. No reference equivalent (TF
    sessions re-trace per process).

    Call once before building models::

        import deepctr_tpu
        deepctr_tpu.enable_compilation_cache()   # ~/.cache/deepctr_tpu/xla

    Unsupported-serialization backends degrade to a warning, not an error.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "deepctr_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    try:
        # JAX initializes the persistent cache once, at the first compile;
        # if anything compiled before this call, the new dir would be
        # silently ignored for the rest of the process without a reset.
        # reset_cache() is safe on an uninitialized cache, so call it
        # unconditionally (is_initialized() now reports enabled-ness, not
        # initialization, and would always be true here).
        from jax.experimental.compilation_cache import \
            compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        try:
            from jax._src import compilation_cache as _cc_priv

            _cc_priv.reset_cache()
        except Exception:
            pass
    return cache_dir


def check_version(version, package="deepctr-tpu", enabled=None):
    """Warn (asynchronously) if a newer release exists on PyPI."""
    if enabled is None:
        enabled = os.environ.get("DEEPCTR_TPU_CHECK_VERSION", "0") == "1"
    if not enabled:
        return

    def check(version):
        try:
            import requests
            from packaging.version import parse

            req = requests.get(
                "https://pypi.python.org/pypi/%s/json" % package, timeout=5
            )
            if req.status_code != 200:
                return
            releases = json.loads(req.text).get("releases", {})
            latest = parse("0")
            for release in releases:
                ver = parse(release)
                if ver.is_prerelease or ver.is_postrelease:
                    continue
                latest = max(latest, ver)
            if latest > parse(version):
                logging.warning(
                    "\n%s version %s detected. Your version is %s.\n"
                    "Use `pip install -U %s` to upgrade.",
                    package, latest, version, package,
                )
        except Exception:
            pass

    t = Thread(target=check, args=(version,))
    t.daemon = True
    t.start()
