"""Worker-side protobuf shim (auto-imported by `site` when this directory
is on PYTHONPATH — see streaming/stateful_tws.py::tws_available).

This container ships no `protobuf` wheel, but the google-cloud-sdk bundle
carries a pure-python protobuf 6.32 runtime. pyspark's transformWithState
gencode is built against 6.33 and its strict version gate refuses an
older runtime; the 6.32↔6.33 skew is wire-compatible for this proto (the
TWS equivalence e2e verifies bit-equal output), so the gate is no-op'd —
but ONLY when `runtime_version` actually resolved from the SDK bundle; a
real protobuf installation keeps its gate.

Detection subtlety: Spark workers have spark-core.jar on sys.path, whose
shaded ``google/protobuf/*.class`` directories import as an EMPTY
namespace package — so ``import google.protobuf`` succeeds uselessly.
Probe for real content (``descriptor``) instead, and purge ONLY the
cached NAMESPACE modules (no ``__file__`` — the shaded-jar decoys) before
re-importing from the SDK path; modules imported from a real installation
are never evicted.

Scoped: only activates when real protobuf content is missing and the SDK
bundle exists; real installs are untouched. The SDK location can be
overridden with $SPARK_GRAFT_PB_SDK_PATH.
"""

import os
import sys

_SDK = os.environ.get(
    "SPARK_GRAFT_PB_SDK_PATH",
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _has_real_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if not _has_real_protobuf() and os.path.isdir(_SDK):
    sys.path.append(_SDK)  # append: never shadow real site-packages
    for _m in [
        m
        for m in sys.modules
        if (m == "google" or m.startswith("google."))
        and getattr(sys.modules[m], "__file__", None) is None
    ]:
        del sys.modules[_m]
    try:
        from google.protobuf import runtime_version as _rv

        if (getattr(_rv, "__file__", "") or "").startswith(_SDK):
            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
