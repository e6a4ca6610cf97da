"""Native (C++) components: de Boor B-spline basis evaluation with
derivatives — the counterpart of the reference's Fortran pppack routines
(src/Fortran/bsplvb.f, bsplvd.f), built on demand with g++ and bound via
ctypes."""

from .binding import (
    bsplvb,
    bsplvd,
    bspline_tables,
    native_available,
    build_library,
)

__all__ = ["bsplvb", "bsplvd", "bspline_tables", "native_available",
           "build_library"]
