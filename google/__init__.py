"""Namespace shim: make ``google.protobuf`` importable in this container.

This environment has no installed ``google`` package (pip install is
unavailable), but pyspark's transformWithStateInPandas worker protocol
needs ``google.protobuf``. A compatible pure runtime (protobuf 4.23.2)
ships inside the machine's google-cloud-sdk under the ``cloudsdk.google``
namespace; ``google/protobuf/__init__.py`` re-exports it and shims the
``runtime_version`` check newer generated code performs.

If a REAL google namespace package exists in site-packages it wins: its
directories are appended to ``__path__`` so genuine installs shadow the
cloudsdk fallback.
"""

import os as _os
import site as _site

__path__ = [_os.path.dirname(_os.path.abspath(__file__))]
for _sp in _site.getsitepackages() + [_site.getusersitepackages()]:
    _cand = _os.path.join(_sp, "google")
    if _os.path.isdir(_cand):
        __path__.append(_cand)
