"""google.protobuf → cloudsdk.google.protobuf alias (see google/__init__).

The cloud-sdk copy is a namespaced build of protobuf 4.23.2: every
internal import says ``cloudsdk.google.protobuf...``, so aliasing the
top-level module is not enough — each submodule import must resolve to
the cloudsdk twin. A meta-path finder handles that generically (lazily,
so only modules actually imported are loaded). Generated code from
protobuf>=5.27 also imports ``google.protobuf.runtime_version`` and
validates the gencode/runtime pair; the 4.23 runtime predates that
module, so a permissive stand-in is provided — wire format and the
``internal.builder`` API the generated modules use are compatible.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys
import types

_CLOUDSDK_ROOT = "/usr/lib/google-cloud-sdk/lib/third_party"

if _CLOUDSDK_ROOT not in sys.path:
    sys.path.append(_CLOUDSDK_ROOT)

try:
    _impl = importlib.import_module("cloudsdk.google.protobuf")
except ImportError as exc:  # pragma: no cover - container without sdk
    raise ImportError(
        "no real google.protobuf installed and the cloudsdk fallback at "
        f"{_CLOUDSDK_ROOT} is unavailable"
    ) from exc

__version__ = _impl.__version__


class _AliasFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Resolve ``google.protobuf.X[.Y]`` to ``cloudsdk.google.protobuf.X[.Y]``."""

    _PREFIX = "google.protobuf."

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith(self._PREFIX):
            return None
        if fullname == "google.protobuf.runtime_version":
            return importlib.util.spec_from_loader(fullname, self)
        twin = "cloudsdk." + fullname
        if importlib.util.find_spec(twin) is None:
            return None
        return importlib.util.spec_from_loader(fullname, self)

    def create_module(self, spec):
        if spec.name == "google.protobuf.runtime_version":
            mod = types.ModuleType(spec.name)
            mod.Domain = types.SimpleNamespace(PUBLIC=1, GOOGLE_INTERNAL=2)
            mod.ValidateProtobufRuntimeVersion = lambda *a, **k: None
            mod.VersionError = RuntimeError
            return mod
        return importlib.import_module("cloudsdk." + spec.name)

    def exec_module(self, module):
        pass


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())

# re-export the top-level attributes (generated code mostly touches
# submodules, but user code may read e.g. google.protobuf.__version__)
for _k in dir(_impl):
    if not _k.startswith("_"):
        globals()[_k] = getattr(_impl, _k)
