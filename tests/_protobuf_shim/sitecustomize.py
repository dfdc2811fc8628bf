"""Offline pure-python google.protobuf fallback for Spark PYTHON
WORKERS (driver-side activation lives in tests/conftest.py).

transformWithState's worker-side state client speaks protobuf to the
JVM state server; this container ships no `protobuf` wheel and cannot
pip-install, but the Google Cloud SDK baked into the image carries a
complete PURE-PYTHON protobuf runtime (6.32) under its App Engine
platform directory. This sitecustomize — put on PYTHONPATH by
conftest before the SparkSession exists, so every JVM-forked python
worker imports it at interpreter startup — makes that copy importable
as `google.protobuf`.

Probe subtlety (the round-10 bug): Spark workers run with
``spark-core_*.jar`` on sys.path, and the jar's internal
``google/protobuf/*.proto`` RESOURCE directory satisfies a bare
``import google.protobuf`` as an EMPTY namespace package (zipimport
treats jar directories as namespace portions). The probe therefore
demands a real module — ``from google.protobuf import descriptor`` —
and on failure purges the half-namespace ``google*`` entries from
sys.modules before appending the SDK path, so the regular package is
re-resolved (PEP 420: a regular package anywhere on the path beats
namespace portions).

Safety properties:
- ONLY active when a working protobuf is not importable and the SDK
  copy exists (a real install always wins the probe).
- The SDK dir is APPENDED to sys.path, never prepended.
- pyspark 4.1's generated _pb2 modules declare gencode 6.33; the SDK
  runtime is 6.32 — same major, one minor apart, within protobuf's
  cross-version guarantee for the features pyspark uses, but the
  strict runtime check refuses minor-older runtimes, so it is
  relaxed. A genuinely incompatible runtime would still fail loudly
  at descriptor load.
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _activate() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return  # working protobuf present: no-op
    except Exception:
        pass
    if not os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
        return
    # drop half-initialized namespace portions (e.g. the spark-core
    # jar's resource dir) so the regular package re-resolves
    for mod in [m for m in sys.modules if m == "google"
                or m.startswith("google.")]:
        del sys.modules[mod]
    if _GAE not in sys.path:
        sys.path.append(_GAE)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass


_activate()
