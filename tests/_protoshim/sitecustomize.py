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


_apply()
