"""Import shim to run the reference Optiland (at /root/reference) for golden-value
generation. Stubs out optional native deps (numba, vtk) that are absent here.

Usage: ``import tools.ref_shim`` before any ``import optiland``.
"""
import sys
import types


def _stub_numba():
    numba = types.ModuleType("numba")
    numba.__file__ = "<numba-stub>"

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]):
            return args[0]

        def deco(f):
            return f

        return deco

    numba.njit = njit
    numba.jit = njit
    numba.prange = range
    sys.modules.setdefault("numba", numba)


def _stub_vtk():
    # Reference only touches vtk inside viewer methods we never call; a bare
    # module is enough to satisfy its top-level ``import vtk``.
    vtk = types.ModuleType("vtk")
    vtk.__file__ = "<vtk-stub>"

    class _Missing:
        def __init__(self, *a, **k):
            raise RuntimeError("vtk is stubbed out in this environment")

    def _getattr(name):
        return _Missing

    vtk.__getattr__ = _getattr
    sys.modules.setdefault("vtk", vtk)


REFERENCE_ROOT = "/root/reference"

_stub_numba()
_stub_vtk()
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
