"""Spark Connect compatibility audit (VERDICT r9 item 4).

A 100 TB deployment in 2026 plausibly fronts Spark Connect, where no
py4j gateway exists: ``spark.sparkContext``, ``df._jdf``, ``_jvm``,
``_jsc`` and ``_jsparkSession`` all raise. Every such access in the
engine package must therefore sit inside a ``try``/``except`` with a
functional fallback (the pattern established by
session.engine_parallelism, registry_mm._hadoop_isdir,
cache_scope.pin and session.apply_object_store_conf).

This test walks the package AST and pins the invariant structurally,
so a new unguarded py4j touch fails CI rather than failing at runtime
on a Connect cluster. Tests and tools are exempt: they run on the
local[32] harness by construction.
"""

from __future__ import annotations

import ast
import os

import airflow_loan_etl_pipeline_spark as pkg

PKG_DIR = os.path.dirname(os.path.abspath(pkg.__file__))

#: Py4j-only accessors: absent/raising on a Spark Connect session.
GATEWAY_ATTRS = {"_jvm", "_jsc", "_jdf", "_jsparkSession", "_sc"}


def _gateway_touches_outside_try(path: str) -> list[str]:
    with open(path) as fh:
        tree = ast.parse(fh.read(), filename=path)
    # annotate parents so we can ask "is this node inside a Try body?"
    for parent in ast.walk(tree):
        for child in ast.iter_child_nodes(parent):
            child._parent = parent  # type: ignore[attr-defined]
    bad = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Attribute) and node.attr in GATEWAY_ATTRS):
            continue
        guarded = False
        cur = node
        while hasattr(cur, "_parent"):
            parent = cur._parent  # type: ignore[attr-defined]
            if isinstance(parent, ast.Try) and cur in parent.body \
                    and parent.handlers:
                guarded = True
                break
            cur = parent
        if not guarded:
            bad.append(f"{os.path.relpath(path, PKG_DIR)}:{node.lineno}")
    return bad


def test_every_py4j_gateway_touch_is_guarded():
    offenders: list[str] = []
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in files:
            if f.endswith(".py"):
                offenders += _gateway_touches_outside_try(
                    os.path.join(root, f)
                )
    assert not offenders, (
        "unguarded py4j gateway access (breaks Spark Connect); wrap in "
        "try/except with a functional fallback: " + ", ".join(offenders)
    )


def test_pin_falls_back_to_localcheckpoint_without_gateway(spark, tmp_path):
    """pin() on a gateway-less session object must not raise: it probes
    the SQL conf `spark.checkpoint.dir` and falls back to
    localCheckpoint. Simulated by a wrapper whose sparkContext raises,
    as Connect's does."""
    from airflow_loan_etl_pipeline_spark.operators.cache_scope import pin

    df = spark.range(10)

    class _NoGatewaySession:
        def __init__(self, real):
            self._real = real
            self.conf = real.conf

        @property
        def sparkContext(self):
            raise RuntimeError("sparkContext is not supported over Connect")

        def __getattr__(self, name):
            return getattr(self._real, name)

    class _DF:
        """Minimal DataFrame facade delegating everything but
        sparkSession to the real frame."""

        def __init__(self, real):
            self._real = real
            self.sparkSession = _NoGatewaySession(real.sparkSession)

        def localCheckpoint(self, eager=True):
            return self._real.localCheckpoint(eager=eager)

        def checkpoint(self, eager=True):
            raise AssertionError(
                "reliable checkpoint chosen without a checkpoint dir"
            )

    out = pin(_DF(df))
    assert out.count() == 10
