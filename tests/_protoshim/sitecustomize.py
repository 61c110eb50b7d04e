"""Opt-in protobuf runtime shim for the transformWithStateInPandas test.

The container ships no ``google.protobuf`` wheel and has no PyPI route,
but the google-cloud-sdk tree on disk bundles a pure-Python protobuf
runtime (6.32.0-dev at /usr/lib/google-cloud-sdk/platform/
google_appengine). Spark 4.1.2's generated ``StateMessage_pb2`` was
gencoded with protobuf 6.33.0 and its import-time
``ValidateProtobufRuntimeVersion`` rejects any older runtime outright —
even a one-minor-behind runtime that parses/serializes the message set
fine (round-trip verified in tests/test_streaming.py).

This module is named ``sitecustomize`` so that putting its directory on
``PYTHONPATH`` applies the shim automatically in EVERY Python process
that inherits the env — in particular the pyspark daemon/worker
processes that transformWithStateInPandas spawns, which import
StateMessage_pb2 themselves and cannot be monkeypatched from the test
process. tests/conftest.py prepends this directory to ``PYTHONPATH``
(before the SparkSession/JVM launches, so workers inherit it) and also
loads the module explicitly for the driver process.

Scope guards:
  - only activates when NO real ``google.protobuf`` is importable (a
    future container with a proper wheel bypasses the shim entirely);
  - the SDK path is APPENDED to sys.path so it can never shadow real
    site-packages;
  - the lenient validator only forgives a same-major, one-minor-ahead
    gencode against the SDK runtime; every other mismatch still raises.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _apply() -> None:
    try:
        # find_spec on a dotted name raises ModuleNotFoundError when the
        # parent package itself is absent — that case means "no real
        # protobuf" too, so treat it the same as a None spec.
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        spec = None
    # loader=None means a NAMESPACE-package match, not a real install:
    # Spark workers get spark-core_*.jar on sys.path (for its py4j
    # helpers), and that jar carries google/protobuf/*.proto RESOURCES
    # with no __init__.py — an importable-looking namespace portion
    # with no code in it. Regular packages beat namespace portions
    # regardless of sys.path order, so appending the SDK still wins.
    if spec is not None and spec.loader is not None:
        return  # a real protobuf install wins; never patch it
    if not os.path.isdir(os.path.join(_SDK, "google", "protobuf")):
        return
    sys.path.append(_SDK)
    try:
        from google.protobuf import runtime_version as rv
    except Exception:  # pragma: no cover — SDK layout changed; no shim
        return
    if not getattr(rv, "__file__", "").startswith(_SDK):
        return
    orig = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except rv.VersionError:
            if major == rv.MAJOR and minor <= rv.MINOR + 1:
                return  # one gencode minor ahead: wire-compatible here
            raise

    rv.ValidateProtobufRuntimeVersion = lenient


def _chain_next_sitecustomize() -> None:
    """Run the sitecustomize this shim shadows, if any.

    Python auto-imports only the FIRST ``sitecustomize`` found on
    sys.path; conftest prepends this directory to PYTHONPATH, so a
    pre-existing environment sitecustomize further down the path would
    otherwise be silently skipped in every worker process. Locate the
    next one and execute it so the shim is additive, not a replacement.
    Only runs when THIS module was the auto-imported ``sitecustomize``
    (conftest also loads the file explicitly under another name — in
    that process the real sitecustomize already ran at startup, and
    chaining would execute it twice).

    The shadowed module executes under ``__name__ == "sitecustomize"``
    (it IS the environment's sitecustomize; a hook gating on that name
    — exactly as this shim itself does — must still fire). It is NOT
    re-registered in sys.modules, where this shim keeps the name. A
    broken downstream hook must not kill workers, so exceptions are
    contained — but reported to stderr the way CPython's site.py
    reports sitecustomize import errors, never swallowed silently."""
    here = os.path.dirname(os.path.abspath(__file__))
    for entry in sys.path:
        if not isinstance(entry, str) or not entry:
            continue
        if os.path.abspath(entry) == here:
            continue
        cand = os.path.join(entry, "sitecustomize.py")
        if not os.path.isfile(cand):
            continue
        spec = importlib.util.spec_from_file_location("sitecustomize", cand)
        try:
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception as exc:
            print(
                "Error in shadowed sitecustomize (%s); continuing anyway:\n"
                "%s: %s" % (cand, type(exc).__name__, exc),
                file=sys.stderr,
            )
        return


_apply()
if __name__ == "sitecustomize":
    _chain_next_sitecustomize()
