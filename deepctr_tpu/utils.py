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
